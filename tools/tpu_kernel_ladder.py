"""Incremental TPU compile ladder for the round-4 MSM rewrite: compiles and
runs each building block in cost order, printing per-step compile+run
seconds, so a remote-compile failure is attributable to ONE piece.

Steps: fmul -> padd -> bucket_accum (small) -> rowperm msm 2^10 ->
rowperm msm 2^14 [-> 2^20 with HALO_LADDER_POW=20].
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


def step(name, fn):
    t0 = time.time()
    r = fn()
    jax.block_until_ready(r)
    t1 = time.time()
    r2 = fn()
    jax.block_until_ready(r2)
    t2 = time.time()
    print(f"{name}: first {t1-t0:.1f}s, second {(t2-t1)*1e3:.1f}ms", flush=True)
    return r


print(f"backend={jax.default_backend()}", flush=True)
rng = np.random.default_rng(5)
a = jnp.asarray(rng.integers(0, 1 << 15, size=(L, 1024), dtype=np.int64).astype(np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 15, size=(L, 1024), dtype=np.int64).astype(np.uint32))
step("fmul@1024", lambda: pk.fmul(a, b))

pp = pp_mod.get_pp(1 << 14)
P = pp.gs_points(1024)
step("padd@1024", lambda: pk.padd((P.x, P.y, P.z), (P.x, P.y, P.z)))

rows = pp.gs_rows(1024)
src = jnp.asarray(rng.integers(0, 1025, size=(8, 1024), dtype=np.int64).astype(np.int32))
Mt = jnp.take(rows, src.reshape(-1), axis=0).T.reshape(40, 8, 1024)
step("bucket_accum@pad8x1024", lambda: pk.bucket_accum(Mt))

for pow2 in [10, 14] + ([int(os.environ["HALO_LADDER_POW"])] if os.environ.get("HALO_LADDER_POW") else []):
    N = 1 << pow2
    pts = pp_mod.get_pp(max(N, 1 << 14)).gs_points(N)
    rws = pp_mod.get_pp(max(N, 1 << 14)).gs_rows(N)
    arr = rng.integers(0, 1 << 15, size=(L, N), dtype=np.int64).astype(np.uint32)
    arr[17] = 0
    s = jnp.asarray(arr)
    c = msm_mod.window_size(N)
    r = step(f"rowperm msm 2^{pow2} (c={c})", lambda: msm_mod._rowperm_msm(
        pts, s, c, msm_mod.pinned_pads(N, c), msm_mod._beffs(c), rows=rws
    ))
    print(f"  ok={bool(np.asarray(r[1]))}", flush=True)
    # timing best-of-3 with distinct scalars
    variants = [jnp.roll(s, i + 1, axis=1) for i in range(3)]
    for v in variants:
        v.block_until_ready()
    dts = []
    for v in variants:
        t0 = time.perf_counter()
        out, okv = msm_mod._rowperm_msm(pts, v, c, msm_mod.pinned_pads(N, c), msm_mod._beffs(c), rows=rws)
        np.asarray(out.x)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    print(f"  run {dt*1e3:.1f} ms = {N/dt:.3e} pts/s", flush=True)
print("LADDER DONE", flush=True)
