"""Quick TPU MSM timing probe: compile + run at a given pow2 for the
selected impl (HALO_TPU_MSM_IMPL).  Prints compile seconds and best-of-3
run ms.  Usage: python tools/tpu_msm_now.py [pow2]"""

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

pow2 = int(sys.argv[1]) if len(sys.argv) > 1 else 14
N = 1 << pow2
print(f"impl={msm_mod._impl()} N=2^{pow2} backend={jax.default_backend()}", flush=True)
t0 = time.time()
pp = pp_mod.get_pp(N)
print(f"URS ready {time.time()-t0:.1f}s", flush=True)
rng = np.random.default_rng(42)
arr = rng.integers(0, 1 << 15, size=(18, N), dtype=np.int64).astype(np.uint32)
arr[17] = 0
scalars = jnp.asarray(arr)
points = pp.gs_points(N)
t0 = time.time()
r = msm_mod.msm(points, scalars)
np.asarray(r.x)
print(f"compile+first-run {time.time()-t0:.1f}s", flush=True)
variants = [jnp.roll(scalars, i + 1, axis=1) for i in range(3)]
for v in variants:
    v.block_until_ready()
dts = []
for v in variants:
    t0 = time.perf_counter()
    np.asarray(msm_mod.msm(points, v).x)
    dts.append(time.perf_counter() - t0)
dt = min(dts)
print(f"run {dt*1e3:.1f} ms = {N/dt:.3e} pts/s", flush=True)
