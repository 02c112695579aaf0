"""Stage breakdown of the dual-route sortrows MSM at n=2^14 (the prover's
per-round shape): sort vs gather vs masked kernel vs suffix/horner, plus
window-size variants - picks c for pcdl.open_'s inner loop."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from halo_accumulation_tpu import runtime  # noqa: E402

runtime.init()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from halo_accumulation_tpu import pp as pp_mod  # noqa: E402
from halo_accumulation_tpu.ops import msm  # noqa: E402
from halo_accumulation_tpu.runtime import cached_jit  # noqa: E402

N = 1 << 14
pp = pp_mod.get_pp(N)
planes = pp.gs_planes(N)
rng = np.random.default_rng(4)
route = jnp.asarray((np.arange(N) >= N // 2).astype(np.int32))
scal = [
    jnp.asarray(np.concatenate([
        rng.integers(0, 1 << 15, size=(17, N), dtype=np.int64).astype(np.uint32),
        np.zeros((1, N), np.uint32)]))
    for _ in range(3)
]


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(jnp.concatenate([jnp.ravel(l)[:2].astype(jnp.uint32) for l in leaves])))


def timed(name, fn, args, reps=3):
    t0 = time.time()
    force(fn(args[0]))
    dts = []
    for i in range(reps):
        t1 = time.perf_counter()
        force(fn(args[(i + 1) % len(args)]))
        dts.append(time.perf_counter() - t1)
    print(f"{name}: {min(dts)*1e3:8.2f} ms (warm {time.time()-t0:.0f}s)", flush=True)


for c in (7, 8, 9):
    pads = msm.pinned_pads(N // 2, c)
    beffs = msm._beffs(c)

    def rundual(s, c=c, pads=pads, beffs=beffs):
        outs, ok = msm._sortrows_msm(planes, s, c, pads, beffs, route=route, nroute=2)
        return outs[0].x, outs[1].x, ok

    timed(f"dual c={c} pads={pads[0]},{pads[1]}", rundual, scal)

# stage split at c=8: sort only, sort+boundaries, sort+gather (no kernel)
c = 8
pads = msm.pinned_pads(N // 2, c)
beffs = msm._beffs(c)
digits = cached_jit(msm._digits, c, static_argnums=1)(scal[0], c)
groups = msm._expand_groups_sorted(pads, beffs, 2)
print("groups:", groups, flush=True)
w0, w1, beff, pad = groups[-1]
Wg = w1 - w0
P = planes.shape[0]
btot = 2 * beff


def sort_only(s):
    dg = cached_jit(msm._digits, c, static_argnums=1)(s, c)[w0:w1]
    dg = dg + route[None].astype(jnp.uint32) * jnp.uint32(beff)
    ops = (dg,) + tuple(jnp.broadcast_to(planes[i][None], (Wg, N)) for i in range(P))
    out = jax.lax.sort(ops, dimension=1, is_stable=False, num_keys=1)
    return [o[:, :2] for o in out]


timed(f"sort only (Wg={Wg})", cached_jit(sort_only, "so"), scal)


def to_gather(s):
    dg = cached_jit(msm._digits, c, static_argnums=1)(s, c)[w0:w1]
    dg = dg + route[None].astype(jnp.uint32) * jnp.uint32(beff)
    ops = (dg,) + tuple(jnp.broadcast_to(planes[i][None], (Wg, N)) for i in range(P))
    srt = jax.lax.sort(ops, dimension=1, is_stable=False, num_keys=1)
    srt = jax.lax.optimization_barrier(srt)
    skey = srt[0]
    splanes = jnp.stack(srt[1:], axis=0)
    bvals = jnp.arange(btot, dtype=jnp.uint32)
    first = jax.vmap(lambda row: jnp.searchsorted(row, bvals, side="left"))(skey)
    firsti = first.astype(jnp.int32)
    a = firsti & ~7
    pad8 = (pad + 7) // 8 + 1
    blk = a[None] // 8 + jnp.arange(pad8, dtype=jnp.int32)[:, None, None]
    gidx = (blk + (jnp.arange(Wg, dtype=jnp.int32) * (N // 8))[None, :, None]).reshape(-1)
    blocks = jnp.take(splanes.reshape(P, Wg * (N // 8), 8), gidx, axis=1, mode="clip")
    return blocks[:, :2, :]


timed("sort+bounds+gather", cached_jit(to_gather, "tg"), scal)
print("DONE", flush=True)
