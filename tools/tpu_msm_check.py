"""On-TPU MSM parity check: staged msm() (and optionally the fused
row-permutation pipeline) vs the pure-python oracle at a size above the round-1 failure
threshold.  Usage: python tools/tpu_msm_check.py [--n 4096] [--fused]."""

from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--classed", action="store_true")
    args = ap.parse_args()

    from halo_accumulation_tpu import runtime

    runtime.init()
    import jax

    from halo_accumulation_tpu import fields as F
    from halo_accumulation_tpu.ops import curve as cv, msm as msm_mod
    from halo_accumulation_tpu.ops.field import FR
    from halo_accumulation_tpu.pcdl import point_to_host

    print(f"backend={jax.default_backend()} n={args.n}", flush=True)
    N = args.n
    rng = np.random.default_rng(5)
    ks = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(N)]
    t0 = time.time()
    pts = [F.p_mul(k, (F.G_X, F.G_Y)) for k in ks]
    ss = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(N)]
    want = F.p_msm(ss, pts)
    print(f"oracle ready in {time.time()-t0:.1f}s", flush=True)

    P = cv.from_affine_ints(pts)
    s = FR.from_ints(ss)

    t0 = time.time()
    R = msm_mod.msm(P, s)
    jax.block_until_ready(R.x)
    print(f"staged msm compile+run {time.time()-t0:.1f}s", flush=True)
    got = point_to_host(R)
    print(f"staged msm N={N}: {'OK' if got == want else 'MISMATCH'}", flush=True)
    ok = got == want

    t0 = time.time()
    R = msm_mod.msm(P, s)
    jax.block_until_ready(R.x)
    print(f"staged msm warm run {time.time()-t0:.3f}s", flush=True)

    if args.classed:
        R2 = msm_mod.msm_classed(P, s)
        got2 = point_to_host(R2)
        print(f"classed msm N={N}: {'OK' if got2 == want else 'MISMATCH'}", flush=True)
        ok = ok and got2 == want

    if args.fused:
        c = 8
        t0 = time.time()
        out, okv = msm_mod._rowperm_msm(
            P, s, c, msm_mod.pinned_pads(N, c), msm_mod._beffs(c)
        )
        jax.block_until_ready(out.x)
        print(f"rowperm compile+run {time.time()-t0:.1f}s", flush=True)
        gotf = point_to_host(out)
        okf = bool(np.asarray(okv))
        print(f"rowperm MSM N={N} c={c}: {'OK' if (gotf == want and okf) else 'MISMATCH'}", flush=True)

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
