"""Planar (minor-axis) gather vs row gather at 2^20 shapes."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from halo_accumulation_tpu import runtime
runtime.init()
import jax, jax.numpy as jnp
from halo_accumulation_tpu import pp as pp_mod
from halo_accumulation_tpu.runtime import cached_jit

N = 1 << 20
M = 384 * 4096
pp = pp_mod.get_pp(N)
rows = pp.gs_rows(N)          # (N+1, 40)
planes = rows.T               # (40, N+1) planar layout
rng = np.random.default_rng(4)

def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(jnp.concatenate([jnp.ravel(l)[:2].astype(jnp.uint32) for l in leaves])))

force(planes)

def timed(name, fn, args):
    force(fn(args[0]))
    dts = []
    for a in args[1:] + [args[0]]:
        t0 = time.perf_counter(); force(fn(a)); dts.append(time.perf_counter() - t0)
    print(f"{name}: {min(dts)*1e3:8.2f} ms", flush=True)

rand_idx = [jnp.asarray(rng.integers(0, N + 1, size=M, dtype=np.int64).astype(np.int32)) for _ in range(3)]

take_planar = cached_jit(lambda idx: jnp.take(planes, idx, axis=1), "take_p")
timed("planar take axis=1 (40, 1.57M)", take_planar, rand_idx)

# planar gather + reshape to kernel layout (lanes, pad, colsP)
tp2 = cached_jit(lambda idx: jnp.take(planes, idx, axis=1).reshape(40, 384, 4096), "take_p2")
timed("planar take + reshape", tp2, rand_idx)

# gather only N (sorted-order stage) then expansion from planar sorted
order = [jnp.asarray(rng.permutation(N + 1)[: N + 1].astype(np.int32)) for _ in range(3)]
t1 = cached_jit(lambda o: jnp.take(planes, o, axis=1), "take_o")
timed("planar take N (sorted stage)", t1, order)
print("DONE", flush=True)
