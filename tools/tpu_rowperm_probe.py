"""Dissect the row-permutation MSM (ops/msm.py rowperm path) stage by
stage.  TUNNEL-SAFE methodology (the axon backend under-reports un-fetched
work and result-caches identical calls): every stage is iterated K times
inside ONE jitted fori_loop with a rotating data dependency, then a scalar
slice is fetched; the ~25 ms RTT is measured separately and subtracted.

Usage: python tools/tpu_rowperm_probe.py [pow2 (default 14)]
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

    from halo_accumulation_tpu import pp as pp_mod
    from halo_accumulation_tpu.ops import curve as cv, msm as msm_mod
    from halo_accumulation_tpu.ops.field import L
    from halo_accumulation_tpu.runtime import cached_jit

    pow2 = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    N = 1 << pow2
    c = int(sys.argv[2]) if len(sys.argv) > 2 else msm_mod.window_size(N)
    print(f"backend={jax.default_backend()} N=2^{pow2} c={c} K={K}", flush=True)

    # RTT
    f0 = jax.jit(lambda a: a + 1)
    x0 = jnp.zeros((8, 128), jnp.uint32)
    np.asarray(f0(x0))
    RTT = t(lambda: np.asarray(f0(x0)), 8)
    print(f"RTT: {RTT*1e3:.2f} ms", flush=True)

    pp = pp_mod.get_pp(max(N, 2048))
    points = pp.gs_points(N)
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 1 << 15, size=(18, N), dtype=np.int64).astype(np.uint32)
    arr[17] = 0
    scalars = jnp.asarray(arr)

    pads = msm_mod.pinned_pads(N, c)
    beffs = msm_mod._beffs(c)
    groups = msm_mod._expand_groups(pads, beffs)
    print(f"pads[:2]={pads[:2]} groups={groups}", flush=True)

    rows = msm_mod._rows_cached(points)
    digits = cached_jit(msm_mod._digits, c, static_argnums=1)(scalars, c)

    w0, w1, beff, pad = max(groups, key=lambda g: (g[1] - g[0]) * g[2] * g[3])
    Wg = w1 - w0
    cols = Wg * beff
    dg = digits[w0:w1]
    src, _ok = cached_jit(msm_mod._perm_slots, "ps", pad, beff, static_argnums=(1, 2))(dg, pad, beff)

    def loop(op):
        """K dependent iterations inside one jit; returns a jitted callable
        taking the op's carried args."""

        def run(*args):
            def body(i, carry):
                out = op(*carry)
                return out if isinstance(out, tuple) else (out,) + carry[1:]

            return jax.lax.fori_loop(0, K, body, args)

        return run

    def timed(name, fn, fetch, extra=""):
        fn()  # compile
        dt = (t(lambda: fetch(fn())) - RTT) / K
        print(f"{name:22s} {dt*1e3:8.2f} ms {extra}", flush=True)
        return dt

    # perm_slots: rotate digits each iteration
    def op_ps(d, s_):
        s2, _ = msm_mod._perm_slots(d, pad, beff)
        return (jnp.roll(d, 1, axis=1), s2)

    f = cached_jit(lambda d, s_: loop(op_ps)(d, s_), "l_ps", pad, beff, Wg, N)
    timed("perm_slots", lambda: f(dg, src), lambda r: np.asarray(r[1][:4]))

    # row gather: rotate src
    def op_g(s_, m):
        return (jnp.roll(s_, 1), jnp.take(rows, s_, axis=0))

    M0 = jnp.take(rows, src, axis=0)
    f = cached_jit(lambda s_, m: loop(op_g)(s_, m), "l_g", pad, cols)
    timed("row gather", lambda: f(src, M0), lambda r: np.asarray(r[1][0, :4]),
          f"({pad*cols*256/1e6:.0f} MB)")

    # transpose: depends on gathered M, rotate M
    def op_t(m, mt):
        return (jnp.roll(m, 1, axis=0), m.T.reshape(64, pad, cols))

    Mt0 = M0.T.reshape(64, pad, cols)
    f = cached_jit(lambda m, mt: loop(op_t)(m, mt), "l_t", pad, cols)
    timed("transpose", lambda: f(M0, Mt0), lambda r: np.asarray(r[1][0, 0, :4]))

    # pad tree: rotate Mt
    def op_tree(mt, s_):
        P = cv.PointVec(mt[0:L], mt[L : 2 * L], mt[2 * L : 3 * L])
        S = cv.sum_points(P, axis=0)
        return (jnp.roll(mt, 1, axis=2), S.x)

    f = cached_jit(lambda mt, s_: loop(op_tree)(mt, s_), "l_tr", pad, cols)
    timed("pad tree", lambda: f(Mt0, Mt0[0:L, 0]), lambda r: np.asarray(r[1][0, :4]),
          f"({(pad-1)*cols/1e6:.2f} Mpadd)")

    # suffix+reduce from bucket sums
    P0 = cv.PointVec(Mt0[0:L], Mt0[L : 2 * L], Mt0[2 * L : 3 * L])
    S0 = cv.sum_points(P0, axis=0)
    Sx = jnp.stack([S0.x, S0.y, S0.z])  # (3, L, cols)

    def op_sr(sx, o):
        S = cv.PointVec(*(sx[i].reshape(L, Wg, beff) for i in range(3)))
        T = S
        sh = 1
        while sh < beff:
            shifted = cv.PointVec(
                *(jnp.concatenate([a[:, :, sh:], cv.identity((Wg, sh))[i]], axis=2)
                  for i, a in enumerate(T))
            )
            T = cv.padd(T, shifted)
            sh *= 2
        V = cv.sum_points(cv.PointVec(*(a[:, :, 1:] for a in T)), axis=1)
        return (jnp.roll(sx, 1, axis=2), V.x)

    f = cached_jit(lambda sx, o: loop(op_sr)(sx, o), "l_sr", Wg, beff)
    timed("suffix+reduce", lambda: f(Sx, Sx[0, :, : Wg]), lambda r: np.asarray(r[1][0, :4]),
          f"({(int(np.log2(beff))*beff + beff)*Wg/1e3:.0f} Kpadd)")

    # horner over windows from per-window points (L, Wg)
    V0 = cv.sum_points(cv.PointVec(*(a.reshape(L, Wg, beff)[:, :, 1:] for a in (S0.x, S0.y, S0.z))), axis=1)
    Vs = jnp.stack([V0.x, V0.y, V0.z])

    def op_h(vs, o):
        r = msm_mod._horner_combine((vs[0], vs[1], vs[2]), c)
        return (jnp.roll(vs, 1, axis=2), r.x)

    f = cached_jit(lambda vs, o: loop(op_h)(vs, o), "l_h", Wg, c)
    timed("horner", lambda: f(Vs, Vs[0, :, 0]), lambda r: np.asarray(r[1][:4]))

    # full msm e2e: rotate scalars each iteration so nothing result-caches
    def op_full(s_, o):
        pt, ok = msm_mod._rowperm_msm(points, s_, c, pads, beffs)
        return (jnp.roll(s_, 1, axis=1), pt.x)

    f = cached_jit(lambda s_, o: loop(op_full)(s_, o), "l_full", c, N)
    dt = timed("rowperm msm e2e", lambda: f(scalars, scalars[:, 0]),
               lambda r: np.asarray(r[1][:4]))
    print(f"=> {N/dt/1e6:.2f} Mpts/s", flush=True)


if __name__ == "__main__":
    main()
