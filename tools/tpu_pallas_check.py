"""On-TPU Pallas kernel check: parity vs XLA ops + throughput."""

from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time

import numpy as np


def timed(fn, fetch, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fetch(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from halo_accumulation_tpu import runtime

    runtime.init()
    import jax
    import jax.numpy as jnp

    from halo_accumulation_tpu import fields as F
    from halo_accumulation_tpu.ops import curve as cv, pallas_kernels as pk
    from halo_accumulation_tpu.ops.field import FQ
    from halo_accumulation_tpu.runtime import cached_jit

    print(f"backend={jax.default_backend()} pallas={pk.enabled()}", flush=True)
    rng = np.random.default_rng(1)
    N = 1 << 18
    a = FQ.from_ints([int.from_bytes(rng.bytes(40), "little") % F.Q for _ in range(512)])
    a = jnp.tile(a, (1, N // 512))
    b = jnp.roll(a, 7, axis=1)

    got = pk.fmul(a, b)
    want = cached_jit(FQ.mul)(a, b)
    ok = bool(np.asarray((FQ.canon(got) == FQ.canon(want)).all()))
    print(f"pallas fmul parity at N={N}: {'OK' if ok else 'MISMATCH'}", flush=True)

    base_probe = jax.jit(lambda x: x + 1)
    one = jnp.ones((8, 128), jnp.uint32)
    base_probe(one)
    base = timed(lambda: base_probe(one), lambda r: int(np.asarray(r[0, 0])), 5)

    K = 64

    def chain_pallas(x, y):
        def body(i, xy):
            x, y = xy
            return pk._fmul_call(x, y, False), x

        x3, y3 = jax.lax.fori_loop(0, K, body, (x, y))
        return x3

    a3 = pk._tile(a)
    b3 = pk._tile(b)
    jc = jax.jit(chain_pallas)
    jc(a3, b3)
    dt = timed(lambda: jc(a3, b3), lambda r: int(np.asarray(r[0, 0, 0]))) - base
    print(f"pallas fmul: {K*N/dt/1e6:.1f} Mfm/s", flush=True)

    def chain_xla(x, y):
        def body(i, xy):
            x, y = xy
            return FQ.mul(x, y), x

        x3, y3 = jax.lax.fori_loop(0, K, body, (x, y))
        return x3

    jx = jax.jit(chain_xla)
    jx(a, b)
    dt = timed(lambda: jx(a, b), lambda r: int(np.asarray(r[0, 0]))) - base
    print(f"xla   fmul: {K*N/dt/1e6:.1f} Mfm/s", flush=True)

    # padd parity + rate
    M = 1 << 17
    P = cv.PointVec(a[:, :M], b[:, :M], FQ.from_int(1, (M,)))
    Q = cv.PointVec(b[:, :M], a[:, :M], FQ.from_int(1, (M,)))
    gx, gy, gz = pk.padd((P.x, P.y, P.z), (Q.x, Q.y, Q.z))
    want = cached_jit(cv.padd)(P, Q)
    okp = bool(np.asarray(cached_jit(cv.peq)(cv.PointVec(gx, gy, gz), want)).all())
    print(f"pallas padd parity at M={M}: {'OK' if okp else 'MISMATCH'}", flush=True)

    arrs = tuple(pk._tile(x) for x in (P.x, P.y, P.z, Q.x, Q.y, Q.z))

    def chain_padd(arrs):
        def body(i, s):
            x, y, z = pk._padd_call((s[0], s[1], s[2], arrs[3], arrs[4], arrs[5]), False)
            return (x, y, z)

        return jax.lax.fori_loop(0, K, body, (arrs[0], arrs[1], arrs[2]))

    jp = jax.jit(chain_padd)
    jp(arrs)
    dt = timed(lambda: jp(arrs), lambda r: int(np.asarray(r[0][0, 0, 0]))) - base
    print(f"pallas padd: {K*M/dt/1e6:.2f} Mpadd/s", flush=True)

    def chain_padd_xla(P):
        return jax.lax.fori_loop(0, K, lambda i, q: cv.padd(q, Q), P)

    jpx = jax.jit(chain_padd_xla)
    jpx(P)
    dt = timed(lambda: jpx(P), lambda r: int(np.asarray(r.x[0, 0]))) - base
    print(f"xla   padd: {K*M/dt/1e6:.2f} Mpadd/s", flush=True)

    return 0 if ok and okp else 1


if __name__ == "__main__":
    import sys

    sys.exit(main())
