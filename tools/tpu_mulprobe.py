"""Raw primitive throughput: dependent chains of u32 mult / add / f32 ops.
Decides the limb-representation tradeoff (15-bit lazy-split vs 13-bit raw
u32 accumulation)."""

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

    print(f"backend={jax.default_backend()}", flush=True)
    N = 1 << 22
    K = 4096
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(1, 1 << 15, (N,), dtype=np.int64).astype(np.uint32))

    one = jnp.ones((8, 128), jnp.uint32)
    f0 = jax.jit(lambda x: x + 1)
    f0(one)
    base = timed(lambda: f0(one), lambda r: int(np.asarray(r[0, 0])), 5)
    print(f"base fetch: {base*1e3:.1f} ms", flush=True)

    def chain(op, x):
        def prog(y):
            return jax.lax.fori_loop(0, K, lambda i, v: op(v), y)

        j = jax.jit(prog)
        j(x)
        dt = timed(lambda: j(x), lambda r: int(np.asarray(r[0]))) - base
        return K * N / dt / 1e9

    print(f"u32 mul (dep chain): {chain(lambda v: v * a, a):.1f} Gop/s", flush=True)
    print(f"u32 add: {chain(lambda v: v + a, a):.1f} Gop/s", flush=True)
    print(f"u32 shift+mask: {chain(lambda v: (v >> jnp.uint32(15)) & jnp.uint32(0x7FFF), a):.1f} Gop/s", flush=True)
    print(f"u32 mul+add (fused?): {chain(lambda v: v * a + a, a):.1f} Gmuladd/s", flush=True)

    af = a.astype(jnp.float32)
    def chainf(op):
        def prog(y):
            return jax.lax.fori_loop(0, K, lambda i, v: op(v), y)

        j = jax.jit(prog)
        j(af)
        dt = timed(lambda: j(af), lambda r: float(np.asarray(r[0]))) - base
        return K * N / dt / 1e9

    print(f"f32 mul: {chainf(lambda v: v * af):.1f} Gop/s", flush=True)
    print(f"f32 fma: {chainf(lambda v: v * af + af):.1f} Gfma/s", flush=True)

    a16 = (a & jnp.uint32(0xFF)).astype(jnp.uint16)

    def prog16(y):
        return jax.lax.fori_loop(0, K, lambda i, v: v * a16, y)

    j16 = jax.jit(prog16)
    j16(a16)
    dt = timed(lambda: j16(a16), lambda r: int(np.asarray(r[0]))) - base
    print(f"u16 mul: {K*N/dt/1e9:.1f} Gop/s", flush=True)


if __name__ == "__main__":
    main()
