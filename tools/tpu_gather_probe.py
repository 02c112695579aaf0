"""Isolate the 2^20 bucket_group cost: random vs sequential row gather,
transpose, and the bucket kernel on pre-staged input."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from halo_accumulation_tpu import runtime
runtime.init()
import jax, jax.numpy as jnp
from halo_accumulation_tpu import pp as pp_mod
from halo_accumulation_tpu.ops import pallas_kernels as pk
from halo_accumulation_tpu.runtime import cached_jit

N = 1 << 20
pad, cols = 384, 4096
M_rows = pad * cols  # 1.57M
pp = pp_mod.get_pp(N)
rows = pp.gs_rows(N)  # (N+1, 40)
rng = np.random.default_rng(4)

def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(jnp.concatenate([jnp.ravel(l)[:2].astype(jnp.uint32) for l in leaves])))

def timed(name, fn, args):
    force(fn(args[0]))
    dts = []
    for a in args[1:] + [args[0]]:
        t0 = time.perf_counter(); force(fn(a)); dts.append(time.perf_counter() - t0)
    print(f"{name}: {min(dts)*1e3:8.2f} ms", flush=True)

rand_idx = [jnp.asarray(rng.integers(0, N + 1, size=M_rows, dtype=np.int64).astype(np.int32)) for _ in range(3)]
seq_idx = [jnp.asarray((np.arange(M_rows, dtype=np.int64) * (i + 1) % (N + 1)).astype(np.int32)) for i in range(1)]
seq_idx = [jnp.asarray(np.minimum(np.arange(M_rows), N).astype(np.int32))]

take = cached_jit(lambda idx: jnp.take(rows, idx, axis=0), "take_g")
timed("gather 1.57M random rows", take, rand_idx)
timed("gather 1.57M sequential rows", take, seq_idx + seq_idx + seq_idx)

tr = cached_jit(lambda idx: jnp.take(rows, idx, axis=0).T.reshape(40, pad, cols), "take_tr")
timed("gather+transpose", tr, rand_idx)

# pre-staged kernel input
Mt = [tr(i) for i in rand_idx]
for m in Mt: force(m)
bk = cached_jit(lambda m: pk.bucket_accum(m), "bk")
timed("bucket_accum kernel only", bk, Mt)

full = cached_jit(lambda idx: pk.bucket_accum(jnp.take(rows, idx, axis=0).T.reshape(40, pad, cols)), "full")
timed("gather+transpose+kernel fused", full, rand_idx)
print("DONE", flush=True)
