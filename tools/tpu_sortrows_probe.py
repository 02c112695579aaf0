"""Validate + time the sort-payload MSM pipeline and the expansion-based
prover on the real TPU: masked-kernel Mosaic compile, correctness vs the
exact ladder, and wall-clocks at 2^14 (MSM, dual-route round, full open)."""
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
from halo_accumulation_tpu.ops import curve as cv, msm  # noqa: E402
from halo_accumulation_tpu.runtime import cached_jit  # noqa: E402


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(jnp.concatenate([jnp.ravel(l)[:2].astype(jnp.uint32) for l in leaves])))


def timed(name, fn, args, reps=3):
    t0 = time.time()
    force(fn(args[0]))
    print(f"{name}: warm {time.time()-t0:.1f}s", flush=True)
    dts = []
    for i in range(reps):
        a = args[(i + 1) % len(args)]
        t0 = time.perf_counter()
        force(fn(a))
        dts.append(time.perf_counter() - t0)
    print(f"{name}: {min(dts)*1e3:8.2f} ms", flush=True)
    return min(dts)


print("backend:", jax.default_backend(), flush=True)
N = 1 << 14
pp = pp_mod.get_pp(1 << 14)
planes = pp.gs_planes(N)
rng = np.random.default_rng(4)

# 1. correctness: sortrows vs exact ladder at N=1024
n1 = 1024
arr = rng.integers(0, 1 << 15, size=(18, n1), dtype=np.int64).astype(np.uint32)
arr[17] = 0
s1 = jnp.asarray(arr)
pts1 = pp.gs_points(n1)
c1 = msm.window_size(n1)
outs, ok = msm._sortrows_msm(
    pp.gs_planes(n1), s1, c1, msm.pinned_pads(n1, c1), msm._beffs(c1)
)
r_ladder = msm.msm_ladder(pts1, s1)
eq = bool(np.asarray(cached_jit(cv.peq)(outs[0], r_ladder))) and bool(np.asarray(ok))
print("sortrows-vs-ladder N=1024:", "OK" if eq else "MISMATCH", flush=True)

# 2. MSM 2^14 timing
scal = [
    jnp.asarray(np.concatenate([
        rng.integers(0, 1 << 15, size=(17, N), dtype=np.int64).astype(np.uint32),
        np.zeros((1, N), np.uint32)]))
    for _ in range(3)
]
c = msm.window_size(N)
pads = msm.pinned_pads(N, c)
beffs = msm._beffs(c)


def run14(s):
    outs, ok = msm._sortrows_msm(planes, s, c, pads, beffs)
    return outs[0].x, ok


timed("sortrows MSM 2^14", run14, scal)

# 3. dual-route round shape at n=2^14 (the prover's per-round MSM)
cd = msm.window_size(N // 2)
padsd = msm.pinned_pads(N // 2, cd)
beffsd = msm._beffs(cd)
route = jnp.asarray((np.arange(N) >= N // 2).astype(np.int32))


def rundual(s):
    outs, ok = msm._sortrows_msm(planes, s, cd, padsd, beffsd, route=route, nroute=2)
    return outs[0].x, outs[1].x, ok


timed("dual-route MSM 2^14", rundual, scal)

# 4. full open_ at d+1=2^14 (the acc_prover-dominating call)
from halo_accumulation_tpu import fields as F, pcdl  # noqa: E402
from halo_accumulation_tpu.ops.field import FR  # noqa: E402

d = N - 1
coeffs_i = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(N)]
cdev = FR.from_ints(coeffs_i)
z = 987654321
zp, v = 1, 0
for co in coeffs_i:
    v = (v + co * zp) % F.R
    zp = zp * z % F.R
t0 = time.time()
C = pcdl.commit(cdev, d, None, pp)
print(f"commit 2^14: {time.time()-t0:.1f}s (incl warm)", flush=True)
prng = np.random.default_rng(8)
t0 = time.time()
pi = pcdl.open_(prng, cdev, C, d, z, None, pp)
print(f"open 2^14 warm+run: {time.time()-t0:.1f}s", flush=True)
for _ in range(2):
    t0 = time.time()
    pi = pcdl.open_(prng, cdev, C, d, z, None, pp)
    print(f"open 2^14: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
pcdl.check(C, d, z, v, pi, pp)
print(f"check (decider) 2^14 warm: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
pcdl.check(C, d, z, v, pi, pp)
print(f"check (decider) 2^14: {time.time()-t0:.2f}s", flush=True)
print("DONE", flush=True)
