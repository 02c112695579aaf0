"""Pre-warm everything bench.py needs so the timed run measures
verification, not setup (criterion likewise excludes chain construction
from the measured helpers, /root/reference/code/benches/acc.rs:76-98):

  * URS disk caches for the bench sizes,
  * persisted chain caches (.chain_cache/chain_<n>_<k>.bin; these are a
    few KB of proofs/accumulators and are committed to the repo so a fresh
    checkout never pays the prover cost inside the bench budget),
  * the XLA/Mosaic compile caches (.jax_cache) for every kernel the bench
    dispatches: MSM at 2^14/2^20, verify_chain fast+slow, decider.

Usage: python tools/warm.py [--sizes 512,16384] [--k 10] [--msm 14,20]
       [--skip-verify]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,16384")
    ap.add_argument("--k", default="10")
    ap.add_argument("--msm", default="14,20")
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    from halo_accumulation_tpu import runtime

    runtime.init()
    import jax
    import jax.numpy as jnp

    from halo_accumulation_tpu import chain, pp as pp_mod
    from halo_accumulation_tpu.ops import msm as msm_mod

    log(f"backend: {jax.default_backend()}")

    for pw in [int(x) for x in args.msm.split(",") if x]:
        N = 1 << pw
        t0 = time.time()
        pp = pp_mod.get_pp(N)
        rng = np.random.default_rng(42)
        arr = rng.integers(0, 1 << 15, size=(18, N), dtype=np.int64).astype(np.uint32)
        arr[17] = 0
        r = msm_mod.msm(pp.gs_points(N), jnp.asarray(arr))
        jax.block_until_ready(r.x)
        log(f"msm 2^{pw} warm: {time.time()-t0:.1f}s")

    cache_dir = os.environ.get("HALO_BENCH_CHAIN_CACHE", ".chain_cache")
    for n in [int(x) for x in args.sizes.split(",") if x]:
        for k in [int(x) for x in args.k.split(",") if x]:
            pp = pp_mod.get_pp(n)
            path = os.path.join(cache_dir, f"chain_{n}_{k}.bin")
            t0 = time.time()
            if os.path.exists(path):
                d, qss, accs = chain.load_chain(path)
                log(f"chain n={n} k={k}: loaded in {time.time()-t0:.1f}s")
            else:
                rng = np.random.default_rng(7)
                d, qss, accs = chain.build_chain(rng, n, k, pp)
                chain.save_chain(path, d, qss, accs)
                log(f"chain n={n} k={k}: built+saved in {time.time()-t0:.1f}s")
            if not args.skip_verify:
                t0 = time.time()
                chain.verify_chain_fast(d, qss, accs, pp)
                log(f"verify_chain_fast n={n} k={k} warm: {time.time()-t0:.1f}s")
                t0 = time.time()
                from halo_accumulation_tpu import acc as acc_mod

                acc_mod.decider(accs[-1], pp)
                log(f"decider n={n} warm: {time.time()-t0:.1f}s")
                t0 = time.time()
                chain.verify_chain_slow(accs[: min(len(accs), 3)], pp)
                log(f"verify_chain_slow n={n} warm: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
