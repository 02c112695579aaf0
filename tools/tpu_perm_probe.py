"""Sub-stage dissection of _perm_slots (the rowperm MSM's index build),
tunnel-safe (rotating-dependency loops + forced fetch, RTT subtracted).

Usage: python tools/tpu_perm_probe.py [pow2 (default 14)] [c (default auto)]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = 8


def t(fn, n: int = 3) -> float:
    fn()
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

    from halo_accumulation_tpu.ops import msm as msm_mod
    from halo_accumulation_tpu.runtime import cached_jit

    pow2 = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    N = 1 << pow2
    c = int(sys.argv[2]) if len(sys.argv) > 2 else msm_mod.window_size(N)
    beff = 1 << c
    pad = msm_mod.pinned_pads(N, c)[1]
    Wg = msm_mod.num_windows(c) - 1
    print(f"backend={jax.default_backend()} N=2^{pow2} c={c} Wg={Wg} pad={pad}", flush=True)

    f0 = jax.jit(lambda a: a + 1)
    x0 = jnp.zeros((8, 128), jnp.uint32)
    np.asarray(f0(x0))
    RTT = t(lambda: np.asarray(f0(x0)), 8)
    print(f"RTT: {RTT*1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(5)
    dg = jnp.asarray(
        rng.integers(0, beff, size=(Wg, N), dtype=np.int64).astype(np.uint32)
    )

    def loop(op):
        def run(*args):
            def body(i, carry):
                out = op(*carry)
                return out if isinstance(out, tuple) else (out,) + carry[1:]

            return jax.lax.fori_loop(0, K, body, args)

        return run

    def timed(name, fn, fetch):
        fn()
        dt = (t(lambda: fetch(fn())) - RTT) / K
        print(f"{name:22s} {dt*1e3:8.2f} ms", flush=True)

    # 1. argsort alone
    def op1(d, o):
        return (jnp.roll(d, 1, axis=1), jnp.argsort(d, axis=1).astype(jnp.int32))

    f = cached_jit(lambda d, o: loop(op1)(d, o), "p1", Wg, N)
    o0 = jnp.argsort(dg, axis=1).astype(jnp.int32)
    timed("argsort", lambda: f(dg, o0), lambda r: np.asarray(r[1][0, :4]))

    # 2. sd gather (take_along_axis on lanes)
    def op2b(sd_in, o):
        sd = jnp.take_along_axis(sd_in, o.astype(jnp.uint32), axis=1)
        return (sd, jnp.roll(o, 1, axis=1))

    f = cached_jit(lambda d, o: loop(op2b)(d, o), "p2", Wg, N)
    timed("sd lane-gather", lambda: f(dg, o0), lambda r: np.asarray(r[0][0, :4]))

    # 3. boundary searchsorted (two sides)
    sd0 = jnp.sort(dg, axis=1)
    bvals = jnp.arange(beff, dtype=sd0.dtype)

    def op3(sd, fst):
        first = jax.vmap(lambda row: jnp.searchsorted(row, bvals, side="left"))(sd)
        nxt = jax.vmap(lambda row: jnp.searchsorted(row, bvals, side="right"))(sd)
        return (jnp.roll(sd, 1, axis=0), (first + nxt).astype(jnp.int32))

    f = cached_jit(lambda sd, fs: loop(op3)(sd, fs), "p3", Wg, N, beff)
    fst0 = jnp.zeros((Wg, beff), jnp.int32)
    timed("searchsorted x2", lambda: f(sd0, fst0), lambda r: np.asarray(r[1][0, :4]))

    # 4. big slot gather (take_along_axis (Wg, pad*beff) from (Wg, N))
    first0 = jax.vmap(lambda row: jnp.searchsorted(row, bvals, side="left"))(sd0).astype(jnp.int32)

    def op4(o, fst, out):
        p = jnp.arange(pad, dtype=jnp.int32)[:, None, None]
        idx = fst[None] + p
        got = jnp.take_along_axis(
            o, jnp.moveaxis(jnp.minimum(idx, N - 1), 0, 1).reshape(Wg, pad * beff), axis=1
        )
        return (jnp.roll(o, 1, axis=1), fst, got)

    f = cached_jit(lambda o, fs, out: loop(op4)(o, fs, out), "p4", Wg, N, pad, beff)
    out0 = jnp.zeros((Wg, pad * beff), jnp.int32)
    timed("slot gather", lambda: f(o0, first0, out0), lambda r: np.asarray(r[2][0, :4]))

    # 5. full _perm_slots
    def op5(d, s_):
        s2, _ = msm_mod._perm_slots(d, pad, beff)
        return (jnp.roll(d, 1, axis=1), s2)

    f = cached_jit(lambda d, s_: loop(op5)(d, s_), "p5", Wg, N, pad, beff)
    s0 = jnp.zeros((pad * Wg * beff,), jnp.int32)
    timed("_perm_slots full", lambda: f(dg, s0), lambda r: np.asarray(r[1][:4]))


if __name__ == "__main__":
    main()
