"""Can lax.sort MOVE the 40-lane point payload cheaper than a gather?"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from halo_accumulation_tpu import runtime
runtime.init()
import jax, jax.numpy as jnp
from halo_accumulation_tpu import pp as pp_mod
from halo_accumulation_tpu.runtime import cached_jit

N = 1 << 20
pp = pp_mod.get_pp(N)
planes = pp.gs_rows(N)[:N].T  # (40, N)
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

keys = [jnp.asarray(rng.integers(0, 1 << 12, size=N, dtype=np.int64).astype(np.uint32)) for _ in range(3)]

def sort_payload(k):
    ops = (k,) + tuple(planes[i] for i in range(40))
    out = jax.lax.sort(ops, dimension=0, is_stable=False, num_keys=1)
    return out[0], out[1]

timed("lax.sort key + 40 payload ops (N=2^20)", cached_jit(sort_payload, "sp"), keys)

def sort_key_only(k):
    return jax.lax.sort((k,), dimension=0, is_stable=False, num_keys=1)[0]

timed("lax.sort key only", cached_jit(sort_key_only, "sk"), keys)

def sort_8payload(k):
    ops = (k,) + tuple(planes[i] for i in range(8))
    out = jax.lax.sort(ops, dimension=0, is_stable=False, num_keys=1)
    return out[0], out[1]

timed("lax.sort key + 8 payload", cached_jit(sort_8payload, "s8"), keys)
print("DONE", flush=True)
