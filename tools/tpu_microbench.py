"""Micro-benchmarks of the limb-arithmetic primitives on the current
backend.  The axon tunnel makes single-op timings unreliable (async queues
+ possible result caching), so every measurement runs K DEPENDENT
iterations inside one jitted program and force-fetches a scalar slice of
the result; rate = K * work / (elapsed - tunnel latency)."""

from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time

import numpy as np

K = 32  # dependent iterations per program


def timed_fetch(fn, fetch, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        fetch(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from halo_accumulation_tpu import runtime

    runtime.init()
    import jax
    import jax.numpy as jnp

    from halo_accumulation_tpu.ops import curve as cv
    from halo_accumulation_tpu.ops.field import FQ

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # tunnel base latency
    one = jnp.ones((8, 128), jnp.uint32)
    f0 = jax.jit(lambda x: x + 1)
    f0(one)
    base = timed_fetch(lambda: f0(one), lambda r: int(np.asarray(r[0, 0])), 5)
    print(f"tunnel fetch latency: {base*1e3:.1f} ms", flush=True)

    N = 1 << 19
    a = jnp.asarray(rng.integers(0, 1 << 15, (18, N), dtype=np.int64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 15, (18, N), dtype=np.int64).astype(np.uint32))

    def chain(op, x0, x1):
        def prog(x, y):
            def body(i, xy):
                x, y = xy
                return (op(x, y), x)

            x, y = jax.lax.fori_loop(0, K, body, (x, y))
            return x

        return jax.jit(prog)

    fmul = chain(FQ.mul, a, b)
    fmul(a, b)
    dt = timed_fetch(lambda: fmul(a, b), lambda r: int(np.asarray(r[0, 0]))) - base
    print(f"FQ.mul: {K*N/dt/1e6:.1f} Mfm/s ({dt*1e3:.1f} ms for {K}x{N})", flush=True)

    M = 1 << 17
    P = cv.PointVec(a[:, :M], b[:, :M], FQ.from_int(1, (M,)))

    def paddprog(p):
        def body(i, q):
            return cv.padd(q, p)

        return jax.lax.fori_loop(0, K, body, p)

    jp = jax.jit(paddprog)
    jp(P)
    dt = timed_fetch(lambda: jp(P), lambda r: int(np.asarray(r.x[0, 0]))) - base
    print(f"padd: {K*M/dt/1e6:.2f} Mpadd/s ({dt*1e3:.1f} ms for {K}x{M})", flush=True)

    def pdblprog(p):
        return jax.lax.fori_loop(0, K, lambda i, q: cv.pdbl(q), p)

    jd = jax.jit(pdblprog)
    jd(P)
    dt = timed_fetch(lambda: jd(P), lambda r: int(np.asarray(r.x[0, 0]))) - base
    print(f"pdbl: {K*M/dt/1e6:.2f} Mpdbl/s", flush=True)

    # argsort at MSM shapes, K dependent sorts
    for (W, NN) in [(32, 4096), (20, 1 << 17)]:
        d = jnp.asarray(rng.integers(0, 1 << 8, (W, NN), dtype=np.int64).astype(np.uint32))

        def sortprog(dd):
            def body(i, x):
                o = jnp.argsort(x, axis=1)
                return jnp.take_along_axis(x, o, axis=1) ^ jnp.uint32(1)

            return jax.lax.fori_loop(0, 8, body, dd)

        js = jax.jit(sortprog)
        js(d)
        dt = (timed_fetch(lambda: js(d), lambda r: int(np.asarray(r[0, 0]))) - base) / 8
        print(f"argsort+gather (W={W},N={NN}): {dt*1e3:.2f} ms each", flush=True)

    # scatter at stage-1 shape
    B, pad, W = 256, 64, 32
    NN = 4096
    ident = jnp.zeros((18, W, B * pad), jnp.uint32)
    vals = jnp.broadcast_to(a[:, None, :NN], (18, W, NN)).reshape(18, W * NN)
    widx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[:, None], (W, NN)).reshape(-1)
    col0 = jnp.asarray(rng.integers(0, B * pad, (W * NN,), dtype=np.int64).astype(np.int32))

    def scatprog(cc):
        def body(i, state):
            acc, c2 = state
            out = ident.at[:, widx, c2].set(vals)
            return acc + out[:, :, 0], (c2 + 1) % (B * pad)

        acc, _ = jax.lax.fori_loop(0, 8, body, (jnp.zeros((18, W), jnp.uint32), cc))
        return acc

    jsc = jax.jit(scatprog)
    jsc(col0)
    dt = (timed_fetch(lambda: jsc(col0), lambda r: int(np.asarray(r[0, 0]))) - base) / 8
    print(f"scatter (18,{W},{B*pad}) set {W*NN}: {dt*1e3:.2f} ms each (x3 coords)", flush=True)


if __name__ == "__main__":
    main()
