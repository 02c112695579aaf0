"""Dissect one accumulation step's prover cost at n = d+1 (default 512):
where do the 86 s/step of BENCH_r02's chain build actually go?

Times, separately and WARM (second call): commit, open_ (with per-phase
counters), common_subroutine, full acc.prover, plus a cold-vs-warm pair so
compile time is visible.

Usage: python tools/tpu_prover_probe.py [pow2 (default 9)]
"""

from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import sys
import time

import numpy as np


def main():
    from halo_accumulation_tpu import runtime

    runtime.init()
    import jax

    from halo_accumulation_tpu import pp as pp_mod
    from halo_accumulation_tpu.ops.field import FR

    pow2 = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    n = 1 << pow2
    d = n - 1
    print(f"backend={jax.default_backend()} n={n}", flush=True)

    t0 = time.perf_counter()
    pp = pp_mod.get_pp(n)
    print(f"pp: {time.perf_counter()-t0:.1f}s", flush=True)
    rng = np.random.default_rng(5)

    coeffs = [chain.rand_scalar(rng) for _ in range(d + 1)]
    cd = FR.from_ints(coeffs)
    w = chain.rand_scalar(rng)
    z = chain.rand_scalar(rng)

    for it in range(2):
        t0 = time.perf_counter()
        C = pcdl.commit(cd, d, w, pp)
        print(f"commit[{it}]: {time.perf_counter()-t0:.2f}s", flush=True)

    for it in range(2):
        t0 = time.perf_counter()
        pi = pcdl.open_(rng, cd, C, d, z, w, pp)
        print(f"open_[{it}]: {time.perf_counter()-t0:.2f}s", flush=True)

    # a full random_instance (commit + open + host poly eval)
    for it in range(2):
        t0 = time.perf_counter()
        q = chain.random_instance(rng, d, pp)
        print(f"random_instance[{it}]: {time.perf_counter()-t0:.2f}s", flush=True)

    # full prover step (the chain builder's unit of work)
    qs = [q]
    for it in range(2):
        t0 = time.perf_counter()
        a = acc_mod.prover(rng, d, qs, pp)
        print(f"acc.prover[{it}]: {time.perf_counter()-t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    acc_mod.verifier(d, qs, a, pp)
    print(f"acc.verifier: {time.perf_counter()-t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    acc_mod.decider(a, pp)
    print(f"acc.decider: {time.perf_counter()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
