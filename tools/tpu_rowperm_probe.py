"""Per-stage wall-clock dissection of the round-4 row-permutation MSM on
TPU: digits -> perm_slots (argsort+boundaries) -> bucket group (gather +
in-kernel pad reduce + suffix weighting + Horner) -> full msm.

Each stage is timed with block_until_ready on DISTINCT inputs per rep (the
axon service result-caches identical dispatches).  Usage:
    python tools/tpu_rowperm_probe.py [pow2]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from halo_accumulation_tpu import runtime

runtime.init()
import jax
import jax.numpy as jnp

from halo_accumulation_tpu import pp as pp_mod
from halo_accumulation_tpu.ops import msm as msm_mod
from halo_accumulation_tpu.runtime import cached_jit

pow2 = int(sys.argv[1]) if len(sys.argv) > 1 else 14
N = 1 << pow2
c = msm_mod.window_size(N)
pp = pp_mod.get_pp(max(N, 1 << 14))
rows = pp.gs_rows(N)
pts = pp.gs_points(N)
rng = np.random.default_rng(9)


def variants(k=3):
    out = []
    for i in range(k):
        arr = rng.integers(0, 1 << 15, size=(18, N), dtype=np.int64).astype(np.uint32)
        arr[17] = 0
        out.append(jnp.asarray(arr))
    return out


def _force(r):
    """block_until_ready is a no-op on the axon remote backend: force
    completion by FETCHING a small slice of every output leaf, batched
    into ONE device_get (each separate fetch costs a ~25 ms round trip)."""
    leaves = jax.tree_util.tree_leaves(r)
    np.asarray(jax.device_get(jnp.concatenate([jnp.ravel(l)[:2].astype(jnp.uint32) for l in leaves])))
    return r


def timed(name, fn, args_list):
    # warmup on the first arg
    _force(fn(args_list[0]))
    dts = []
    for a in args_list[1:] + [args_list[0]]:
        t0 = time.perf_counter()
        _force(fn(a))
        dts.append(time.perf_counter() - t0)
    print(f"{name}: {min(dts)*1e3:8.2f} ms", flush=True)
    return fn(args_list[0])


print(f"N=2^{pow2} c={c} backend={jax.default_backend()}", flush=True)
svars = variants(4)

dig_fn = cached_jit(msm_mod._digits, c, static_argnums=1)
digits = timed("digits", lambda s: dig_fn(s, c), svars)

pads = msm_mod.pinned_pads(N, c)
beffs = msm_mod._beffs(c)
groups = msm_mod._expand_groups(pads, beffs)
print(f"groups: {groups}", flush=True)

dvars = [dig_fn(s, c) for s in svars]
for d in dvars:
    _force(d)
for w0, w1, beff, pad in groups:
    Wg = w1 - w0
    ps_fn = cached_jit(msm_mod._perm_slots, "ps", pad, beff, static_argnums=(1, 2))
    src = timed(
        f"perm_slots w[{w0}:{w1}] pad={pad} beff={beff}",
        lambda d: ps_fn(d[w0:w1], pad, beff)[0],
        dvars,
    )
    bg_fn = cached_jit(
        msm_mod._bucket_group_rows, "bg", pad, Wg, beff, static_argnums=(2, 3, 4)
    )
    srcs = [ps_fn(d[w0:w1], pad, beff)[0] for d in dvars]
    for s2 in srcs:
        _force(s2)  # don't bill src construction to the bucket stage
    _force(bg_fn(rows, srcs[0], pad, Wg, beff))
    dts = []
    for s2 in srcs[1:] + [srcs[0]]:
        t0 = time.perf_counter()
        _force(bg_fn(rows, s2, pad, Wg, beff))
        dts.append(time.perf_counter() - t0)
    print(f"bucket_group w[{w0}:{w1}]: {min(dts)*1e3:8.2f} ms", flush=True)

def full_fetch(s):
    out, _ = msm_mod._rowperm_msm(pts, s, c, pads, beffs, rows=rows)
    return np.asarray(out.x)

timed("full rowperm msm (fetch)", full_fetch, svars)
