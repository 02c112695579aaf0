"""TPU fused-graph miscompile probe / reproducer.

Round-1 finding (commit f74c5b8): on the TPU backend, a single jitted
program containing the fused Pippenger pipeline (scatter -> pad tree-reduce
-> suffix scan -> lane reduce, ~25 point-add-equivalents) returns stable
off-curve garbage at N >= 1024, while each <= 17-op subgraph of it, run
alone, is bit-correct, and the identical program is correct on XLA:CPU.
The production MSM therefore runs as four modest dispatches (ops/msm.py).

This script probes the boundary so the workaround can be pinned (or lifted
when the backend is fixed).  It builds a random point vector, computes the
true sum with the pure-python oracle, and then evaluates jitted programs of
increasing point-op depth, comparing each against the oracle:

  probe(k): tree-reduce N points to one (lg N padds) then k extra pdbl.
  pip(N):   one full row-permutation window group at N (the production
            fused shape since round 3; the round-1 failing class).

Usage:  python tools/tpu_fusion_probe.py [--n 1024] [--max-extra 64]
Prints one line per configuration: OK / MISMATCH.
"""

from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--max-extra", type=int, default=64)
    ap.add_argument("--pippenger", action="store_true", help="also run the fused rowperm group repro")
    args = ap.parse_args()

    from halo_accumulation_tpu import runtime

    runtime.init()
    import jax

    from halo_accumulation_tpu import fields as F
    from halo_accumulation_tpu.ops import curve as cv, msm as msm_mod
    from halo_accumulation_tpu.ops.field import FR

    print(f"backend={jax.default_backend()} n={args.n}", file=sys.stderr)

    N = args.n
    rng = np.random.default_rng(11)
    # points: k_i * G via host oracle
    ks = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(N)]
    pts = [F.p_mul(k, (F.G_X, F.G_Y)) for k in ks]
    oracle_sum = F.p_msm([1] * N, pts)
    P = cv.from_affine_ints(pts)

    def check(name, Pdev):
        from halo_accumulation_tpu.pcdl import point_to_host

        got = point_to_host(Pdev)
        ok = got == oracle_sum
        print(f"{name}: {'OK' if ok else 'MISMATCH'}")
        return ok

    # depth sweep: tree reduce (lg N padds) + k extra doublings
    lgn = N.bit_length() - 1
    doubled_oracle = oracle_sum
    results = []
    for k in [0, 4, 8, 16, 32, args.max_extra]:
        def f(Pv, k=k):
            s = cv.sum_points(Pv, axis=0)
            for _ in range(k):
                s = cv.pdbl(s)
            return s

        out = jax.jit(f)(P)
        jax.block_until_ready(out.x)
        from halo_accumulation_tpu.pcdl import point_to_host

        got = point_to_host(out)
        want = doubled_oracle
        for _ in range(k):
            want = F.p_add(want, want)
        ok = got == want
        results.append((lgn + k, ok))
        print(f"depth={lgn}+{k} point-ops: {'OK' if ok else 'MISMATCH'}")

    if args.pippenger:
        # the production fused shape: full rowperm MSM with pinned pads
        scalars = FR.from_ints(ks)
        c = 8
        out, okv = msm_mod._rowperm_msm(
            P, scalars, c, msm_mod.pinned_pads(N, c), msm_mod._beffs(c)
        )
        jax.block_until_ready(out.x)
        from halo_accumulation_tpu.pcdl import point_to_host

        got = point_to_host(out)
        want = F.p_msm(ks, pts)
        okf = bool(np.asarray(okv))
        print(f"rowperm MSM N={N} c={c}: {'OK' if (got == want and okf) else 'MISMATCH'}")

    bad = [d for d, ok in results if not ok]
    if bad:
        print(f"MISCOMPILE present: first failing depth {min(bad)}")
        return 1
    print("all probes OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
