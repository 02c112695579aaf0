"""Measure TPU dispatch/sync latency and staged-vs-fused MSM timing.
Informs how aggressively to fuse kernels (tunnel round-trips may dominate)."""

from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time

import numpy as np


def t(fn, n=10):
    fn()
    best = min(time.perf_counter() - t0 for t0 in [time.perf_counter()] if fn() is None or True for _ in [0])
    # simple best-of loop
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from halo_accumulation_tpu import runtime

    runtime.init()
    import jax
    import jax.numpy as jnp

    from halo_accumulation_tpu import fields as F
    from halo_accumulation_tpu.ops import curve as cv, msm as msm_mod
    from halo_accumulation_tpu.runtime import cached_jit

    print(f"backend={jax.default_backend()}", flush=True)

    # 1. trivial dispatch latency
    x = jnp.ones((8, 128), jnp.uint32)
    f = jax.jit(lambda a: a + 1)
    jax.block_until_ready(f(x))
    dt = t(lambda: jax.block_until_ready(f(x)))
    print(f"trivial dispatch+sync: {dt*1e3:.2f} ms", flush=True)

    # launch without sync (queue depth cost)
    def chain10():
        y = x
        for _ in range(10):
            y = f(y)
        jax.block_until_ready(y)

    dt = t(chain10)
    print(f"10 chained dispatches+1 sync: {dt*1e3:.2f} ms", flush=True)

    # device->host scalar fetch
    dt = t(lambda: int(np.asarray(f(x))[0, 0]))
    print(f"dispatch+fetch scalar: {dt*1e3:.2f} ms", flush=True)

    # 2. MSM timing breakdown at N=4096
    N = 4096
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 1 << 15, size=(18, N), dtype=np.int64).astype(np.uint32)
    arr[17] = 0
    s = jnp.asarray(arr)
    # points: reuse generator multiples cheaply via device doubling chain
    G = cv.from_affine_ints([(F.G_X, F.G_Y)] * N)
    P = G  # any points work for timing

    c = 5
    digits = cached_jit(msm_mod._digits, c, static_argnums=1)(s, c)
    jax.block_until_ready(digits)
    dt = t(lambda: jax.block_until_ready(cached_jit(msm_mod._digits, c, static_argnums=1)(s, c)))
    print(f"digits: {dt*1e3:.2f} ms", flush=True)

    pad = msm_mod._measure_pad(digits, c)
    dt = t(lambda: msm_mod._measure_pad(digits, c))
    print(f"measure_pad (sync): {dt*1e3:.2f} ms", flush=True)

    S = msm_mod._bucket_sums(P, digits, c, pad)
    jax.block_until_ready(S[0])
    dt = t(lambda: jax.block_until_ready(msm_mod._bucket_sums(P, digits, c, pad)[0]))
    print(f"bucket_sums c={c} pad={pad}: {dt*1e3:.2f} ms", flush=True)

    tmask = cached_jit(msm_mod._suffix_mask, "sm", c, static_argnums=1)(S, c)
    jax.block_until_ready(tmask[0])
    dt = t(lambda: jax.block_until_ready(cached_jit(msm_mod._suffix_mask, "sm", c, static_argnums=1)(S, c)[0]))
    print(f"suffix_mask: {dt*1e3:.2f} ms", flush=True)

    r = cached_jit(msm_mod._window_reduce, "wr")(tmask)
    jax.block_until_ready(r[0])
    dt = t(lambda: jax.block_until_ready(cached_jit(msm_mod._window_reduce, "wr")(tmask)[0]))
    print(f"window_reduce: {dt*1e3:.2f} ms", flush=True)

    out = cached_jit(msm_mod._horner_combine, "hc", c, static_argnums=1)(r, c)
    jax.block_until_ready(out.x)
    dt = t(lambda: jax.block_until_ready(cached_jit(msm_mod._horner_combine, "hc", c, static_argnums=1)(r, c).x))
    print(f"horner_combine: {dt*1e3:.2f} ms", flush=True)

    dt = t(lambda: jax.block_until_ready(msm_mod.msm(P, s).x), 5)
    print(f"msm total: {dt*1e3:.2f} ms", flush=True)

    # rowperm comparison
    c8 = 8
    rp = lambda: msm_mod._rowperm_msm(  # noqa: E731
        P, s, c8, msm_mod.pinned_pads(P.x.shape[1], c8), msm_mod._beffs(c8)
    )
    jax.block_until_ready(rp()[0].x)
    dt = t(lambda: jax.block_until_ready(rp()[0].x), 5)
    print(f"rowperm msm c=8: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
