"""Time the data-movement parts of the MSM stage 1 on the current backend:
argsort, point gather, searchsorted, scatter, and a one-hot-cumsum ranking
alternative that avoids sorting entirely."""

from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time

import numpy as np


def t(fn, n=5):
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


    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    for (W, N, c) in [(32, 4096, 8), (20, 1 << 17, 13)]:
        B = 1 << c
        d = jnp.asarray(rng.integers(0, B, (W, N), dtype=np.int64).astype(np.uint32))
        print(f"--- W={W} N={N} B={B}", flush=True)

        srt = jax.jit(lambda x: jnp.argsort(x, axis=1))
        order = srt(d)
        jax.block_until_ready(order)
        dt = t(lambda: jax.block_until_ready(srt(d)))
        print(f"argsort (W,N): {dt*1e3:.2f} ms", flush=True)

        px = jnp.asarray(rng.integers(0, 1 << 15, (18, N), dtype=np.int64).astype(np.uint32))
        gat = jax.jit(lambda a, o: jnp.take(a, o, axis=1))
        jax.block_until_ready(gat(px, order))
        dt = t(lambda: jax.block_until_ready(gat(px, order)))
        print(f"gather 1 coord (L,W,N): {dt*1e3:.2f} ms (x3 coords)", flush=True)

        sd = jax.jit(lambda x, o: jnp.take_along_axis(x, o, axis=1))(d, order)
        ss = jax.jit(lambda x: jax.vmap(lambda row: jnp.searchsorted(row, row, side="left"))(x))
        jax.block_until_ready(ss(sd))
        dt = t(lambda: jax.block_until_ready(ss(sd)))
        print(f"searchsorted: {dt*1e3:.2f} ms", flush=True)

        # scatter: (L, W, B*pad) ident .at[:, widx, col].set
        pad = 2 * max(1, N // B)
        ident = jnp.zeros((18, W, B * pad), jnp.uint32)
        widx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[:, None], (W, N)).reshape(-1)
        col = jnp.asarray(rng.integers(0, B * pad, (W * N,), dtype=np.int64).astype(np.int32))
        vals = jnp.broadcast_to(px[:, None, :], (18, W, N)).reshape(18, W * N)
        sca = jax.jit(lambda i, w, cc, v: i.at[:, w, cc].set(v))
        jax.block_until_ready(sca(ident, widx, col, vals))
        dt = t(lambda: jax.block_until_ready(sca(ident, widx, col, vals)))
        print(f"scatter 1 coord pad={pad}: {dt*1e3:.2f} ms (x3)", flush=True)

        # one-hot cumsum ranking (sort-free): rank_i = cumsum(onehot)[i, d_i] - 1
        if N * B <= (1 << 27):
            def rank_fn(dd):
                oh = jax.nn.one_hot(dd, B, dtype=jnp.int32)  # (W, N, B)
                cs = jnp.cumsum(oh, axis=1)
                return jnp.take_along_axis(cs, dd[..., None].astype(jnp.int32), axis=2)[..., 0] - 1

            rk = jax.jit(rank_fn)
            jax.block_until_ready(rk(d))
            dt = t(lambda: jax.block_until_ready(rk(d)))
            print(f"one-hot cumsum rank: {dt*1e3:.2f} ms", flush=True)

        # direct scatter WITHOUT sort: col = d*pad + rank (needs rank only)
        # so stage 1 = rank + scatter + tree reduce; no argsort, no gather!


if __name__ == "__main__":
    main()
