"""Dissect the staged Pippenger MSM wall-clock into its pipeline stages on
the current backend: digits, pad measurement, stage-1 split into
sort / gather / scatter / pad-tree-reduce, suffix scan, window reduce,
Horner combine.  Each stage is timed as its own jitted call with dependent
inputs and a forced fetch (the axon tunnel under-reports un-fetched work;
see tools/tpu_mulprobe.py).

Usage: python tools/tpu_stage_probe.py [pow2 (default 14)] [c (default auto)]
"""

from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import sys
import time

import numpy as np


def t(fn, n: int = 3) -> float:
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

    from halo_accumulation_tpu import pp as pp_mod
    from halo_accumulation_tpu.ops import curve as cv, msm as msm_mod
    from halo_accumulation_tpu.runtime import cached_jit

    pow2 = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    N = 1 << pow2
    c = int(sys.argv[2]) if len(sys.argv) > 2 else msm_mod.window_size(N)
    print(f"backend={jax.default_backend()} N=2^{pow2} c={c}", flush=True)

    pp = pp_mod.get_pp(max(N, 2048))
    points = pp.gs_points(N)
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 1 << 15, size=(18, N), dtype=np.int64).astype(np.uint32)
    arr[17] = 0
    scalars = jnp.asarray(arr)

    fetch = lambda a: jax.block_until_ready(a)  # noqa: E731

    dig_fn = cached_jit(msm_mod._digits, c, static_argnums=1)
    digits = dig_fn(scalars, c)
    fetch(digits)
    print(f"digits:        {t(lambda: fetch(dig_fn(scalars, c)))*1e3:8.2f} ms", flush=True)

    t0 = time.perf_counter()
    pads = msm_mod._measure_pads(digits, c)
    print(f"measure_pads:  {(time.perf_counter()-t0)*1e3:8.2f} ms (sync) pads={pads}", flush=True)
    beffs = msm_mod._beffs(c)

    pad = max(pads)
    W = msm_mod.num_windows(c)

    # ---- stage 1 sub-steps (mirrors _bucket_sums_chunk) --------------------
    def sort_only(digits):
        order = jnp.argsort(digits, axis=1)
        sd = jnp.take_along_axis(digits, order, axis=1)
        return order, sd

    def gather_only(points, order):
        Wc = order.shape[0]
        return cv.PointVec(*(jnp.take(a, order, axis=1).reshape(L, Wc * N) for a in points))

    def rank_scatter(points_g, sd, pad):
        Wc = sd.shape[0]
        first = jax.vmap(lambda row: jnp.searchsorted(row, row, side="left"))(sd)
        rank = jnp.arange(N, dtype=first.dtype)[None, :] - first
        col = sd.astype(jnp.int32) * pad + jnp.minimum(rank, pad - 1).astype(jnp.int32)
        widx = jnp.broadcast_to(
            jnp.arange(Wc, dtype=jnp.int32)[:, None], (Wc, N)
        ).reshape(Wc * N)
        colf = col.reshape(Wc * N)
        B = 1 << c
        ident = cv.identity((Wc, B * pad))
        return cv.PointVec(
            ident.x.at[:, widx, colf].set(points_g.x),
            ident.y.at[:, widx, colf].set(points_g.y),
            ident.z.at[:, widx, colf].set(points_g.z),
        )

    def tree_reduce(M, pad):
        Wc = M.x.shape[1]
        B = 1 << c
        Mr = cv.PointVec(*(a.reshape(L, Wc, B, pad) for a in M))
        S = cv.sum_points(Mr, axis=2)
        return tuple(jnp.moveaxis(a, 0, 1) for a in S)

    so = cached_jit(sort_only, "so")
    order, sd = so(digits)
    fetch(sd)
    print(f"sort:          {t(lambda: fetch(so(digits)[1]))*1e3:8.2f} ms", flush=True)

    ga = cached_jit(gather_only, "ga")
    pg = ga(points, order)
    fetch(pg.x)
    print(f"gather:        {t(lambda: fetch(ga(points, order).x))*1e3:8.2f} ms", flush=True)

    rs = cached_jit(rank_scatter, "rs", pad, static_argnums=2)
    M = rs(pg, sd, pad)
    fetch(M.x)
    print(f"rank+scatter:  {t(lambda: fetch(rs(pg, sd, pad).x))*1e3:8.2f} ms", flush=True)

    tr = cached_jit(tree_reduce, "tr", pad, static_argnums=1)
    S = tr(M, pad)
    fetch(S[0])
    print(f"pad tree:      {t(lambda: fetch(tr(M, pad)[0]))*1e3:8.2f} ms", flush=True)

    sm = cached_jit(msm_mod._suffix_mask, "sm", c, static_argnums=1)
    ts = sm(S, c)
    fetch(ts[0])
    print(f"suffix scan:   {t(lambda: fetch(sm(S, c)[0]))*1e3:8.2f} ms", flush=True)

    wr = cached_jit(msm_mod._window_reduce, "wr")
    r = wr(ts)
    fetch(r[0])
    print(f"window reduce: {t(lambda: fetch(wr(ts)[0]))*1e3:8.2f} ms", flush=True)

    hc = cached_jit(msm_mod._horner_combine, "hc", c, static_argnums=1)
    h = hc(r, c)
    fetch(h.x)
    print(f"horner:        {t(lambda: fetch(hc(r, c).x))*1e3:8.2f} ms", flush=True)

    # end-to-end for reference
    r0 = msm_mod.msm(points, scalars)
    fetch(r0.x)
    print(f"msm() e2e:     {t(lambda: fetch(msm_mod.msm(points, scalars).x))*1e3:8.2f} ms", flush=True)
    rf, ok = msm_mod.msm_flagged(points, scalars)
    fetch(rf.x)
    print(
        f"msm_flagged:   {t(lambda: fetch(msm_mod.msm_flagged(points, scalars)[0].x))*1e3:8.2f} ms"
        f" (pinned pads, ok={bool(np.asarray(ok))})",
        flush=True,
    )


if __name__ == "__main__":
    main()
