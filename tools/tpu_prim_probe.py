"""Primitive-rate probe for the MSM redesign, LATENCY-AMORTIZED: the axon
tunnel costs ~26 ms per fetch, so each primitive is iterated K times inside
one jitted fori_loop (data-dependent) and fetched once.

Usage: python tools/tpu_prim_probe.py
"""

from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time

import numpy as np

RTT = 0.0  # measured below


def t(fn, n: int = 3) -> float:
    fn()  # warm/compile
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

    from halo_accumulation_tpu.ops import curve as cv
    from halo_accumulation_tpu.ops.field import L
    from halo_accumulation_tpu.runtime import cached_jit

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    def rand_fq(n):
        a = rng.integers(0, 1 << 15, size=(L, n), dtype=np.int64).astype(np.uint32)
        a[17] &= 0x3
        return jnp.asarray(a)

    # ---- round-trip latency ------------------------------------------------
    x = jnp.zeros((8, 128), jnp.uint32)
    f = jax.jit(lambda a: a + 1)
    jax.block_until_ready(f(x))
    global RTT
    RTT = t(lambda: np.asarray(f(x)), 10)
    print(f"dispatch+fetch RTT:      {RTT*1e3:8.2f} ms", flush=True)

    K = 16

    def looped(op, args):
        """Iterate op K times with a rotating data dependency, one dispatch."""

        def body(i, carry):
            out = op(*carry)
            if isinstance(out, tuple):
                return out + carry[len(out) :]
            return (out,) + carry[1:]

        return jax.lax.fori_loop(0, K, body, args)

    # ---- Pallas padd/pdbl/fmul, loop-amortized ------------------------------
    from halo_accumulation_tpu.ops import pallas_kernels as pk

    for n in (1 << 14, 1 << 17, 1 << 20):
        P1 = tuple(rand_fq(n) for _ in range(3))
        P2 = tuple(rand_fq(n) for _ in range(3))

        def op(x1, y1, z1, x2, y2, z2):
            ox, oy, oz = pk.padd((x1, y1, z1), (x2, y2, z2))
            return (ox, oy, oz)

        fn = cached_jit(lambda *a: looped(op, a), "lpadd", n, K)
        run = lambda: jax.block_until_ready(fn(*P1, *P2)[0])  # noqa: E731
        dt = (t(run) - RTT) / K
        print(f"padd n=2^{n.bit_length()-1}: {dt*1e3:8.2f} ms = {n/dt/1e6:7.1f} Mpadd/s", flush=True)

    for n in (1 << 20,):
        P1 = tuple(rand_fq(n) for _ in range(3))

        def opd(x1, y1, z1):
            return pk.pdbl((x1, y1, z1))

        fn = cached_jit(lambda *a: looped(opd, a), "lpdbl", n, K)
        run = lambda: jax.block_until_ready(fn(*P1)[0])  # noqa: E731
        dt = (t(run) - RTT) / K
        print(f"pdbl n=2^{n.bit_length()-1}: {dt*1e3:8.2f} ms = {n/dt/1e6:7.1f} Mpdbl/s", flush=True)

        a, b = rand_fq(n), rand_fq(n)
        fnm = cached_jit(lambda u, v: looped(lambda p, q: (pk.fmul(p, q), q), (u, v)), "lfmul", n, K)
        run = lambda: jax.block_until_ready(fnm(a, b)[0])  # noqa: E731
        dt = (t(run) - RTT) / K
        print(f"fmul n=2^{n.bit_length()-1}: {dt*1e3:8.2f} ms = {n/dt/1e6:7.1f} Mfmul/s", flush=True)

    # ---- XLA-path padd (cv.padd without pallas) -----------------------------
    import os

    os.environ["HALO_TPU_PALLAS"] = "0"
    n = 1 << 17
    P1 = cv.PointVec(*(rand_fq(n) for _ in range(3)))
    P2 = cv.PointVec(*(rand_fq(n) for _ in range(3)))

    def opx(x1, y1, z1, x2, y2, z2):
        R = cv.padd(cv.PointVec(x1, y1, z1), cv.PointVec(x2, y2, z2))
        return (R.x, R.y, R.z)

    fn = cached_jit(lambda *a: looped(opx, a), "xpadd", n, K)
    run = lambda: jax.block_until_ready(fn(*P1, *P2)[0])  # noqa: E731
    dt = (t(run) - RTT) / K
    print(f"XLA padd n=2^{n.bit_length()-1}: {dt*1e3:8.2f} ms = {n/dt/1e6:7.1f} Mpadd/s", flush=True)
    os.environ.pop("HALO_TPU_PALLAS")

    # ---- gathers, loop-amortized (rotate idx to defeat caching) ------------
    for R, Cc in ((1 << 14, 64), (1 << 19, 64), (1 << 19, 128), (1 << 20, 16)):
        src = jnp.asarray(rng.integers(0, 1 << 30, size=(R, Cc), dtype=np.int64).astype(np.uint32))
        idx = jnp.asarray(rng.integers(0, R, size=(R,), dtype=np.int64).astype(np.int32))

        def opg(s, i):
            out = jnp.take(s, i, axis=0)
            return (out, jnp.roll(i, 1))

        fn = cached_jit(lambda s, i: looped(opg, (s, i)), "lg", R, Cc, K)
        run = lambda: jax.block_until_ready(fn(src, idx)[0])  # noqa: E731
        dt = (t(run) - RTT) / K
        mb = R * Cc * 4 / 1e6
        print(f"take axis0 ({R}x{Cc}): {dt*1e3:8.2f} ms = {mb/dt/1e3:7.2f} GB/s", flush=True)

    # one-hot int8 matmul permutation
    Ns, F2 = 1 << 14, 256
    src8 = jnp.asarray(rng.integers(0, 127, size=(Ns, F2), dtype=np.int64).astype(np.int8))
    idx = jnp.asarray(rng.integers(0, Ns, size=(Ns,), dtype=np.int64).astype(np.int32))

    def perm_mm(src, i):
        oh = (i[:, None] == jnp.arange(Ns, dtype=jnp.int32)[None, :]).astype(jnp.int8)
        out = jax.lax.dot_general(oh, src, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return (out.astype(jnp.int8), jnp.roll(i, 1))

    fn = cached_jit(lambda s, i: looped(perm_mm, (s, i)), "lpm", Ns, F2, K)
    run = lambda: jax.block_until_ready(fn(src8, idx)[0])  # noqa: E731
    dt = (t(run) - RTT) / K
    print(f"onehot-mm perm ({Ns}x{F2}B): {dt*1e3:8.2f} ms = {Ns*F2/dt/1e9:7.2f} GB/s", flush=True)

    # argsort
    for Wn, Nn in ((32, 1 << 14), (20, 1 << 20)):
        d = jnp.asarray(rng.integers(0, 256, size=(Wn, Nn), dtype=np.int64).astype(np.uint32))

        def ops(dd):
            o = jnp.argsort(dd, axis=1)
            return (o.astype(jnp.uint32),)

        fn = cached_jit(lambda dd: looped(ops, (dd,)), "lsort", Wn, Nn, K)
        run = lambda: jax.block_until_ready(fn(d)[0])  # noqa: E731
        dt = (t(run) - RTT) / K
        print(f"argsort ({Wn}x{Nn}): {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
