"""MSM kernels vs the oracle, including adversarial digit distributions
(all-equal scalars, zero-heavy padded vectors) that stress the dump-bucket
and PAD logic."""

import numpy as np
import pytest

from halo_accumulation_tpu import fields as F
from halo_accumulation_tpu.ops import curve as cv, msm
from halo_accumulation_tpu.ops.field import FR


def rand_points(rng, n):
    G = (F.G_X, F.G_Y)
    return [F.p_mul(int.from_bytes(rng.bytes(40), "little") % F.R, G) for _ in range(n)]


def run_msm(points_aff, scalars_int, **kw):
    P = cv.from_affine_ints(points_aff)
    s = FR.from_ints(scalars_int)
    R = msm.msm(P, s, **kw)
    x, y, inf = cv.to_affine(cv.PointVec(R.x[:, None], R.y[:, None], R.z[:, None]))
    from halo_accumulation_tpu.ops.field import FQ

    if bool(np.asarray(inf)[0]):
        return None
    return (int(FQ.to_ints(x)[0]), int(FQ.to_ints(y)[0]))


@pytest.mark.parametrize("n", [4, 37, 128])
def test_msm_random(rng, n):
    pts = rand_points(rng, n)
    ss = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(n)]
    assert run_msm(pts, ss) == F.p_msm(ss, pts)


def test_msm_adversarial(rng):
    n = 64
    pts = rand_points(rng, n)
    # all-equal scalars: every nonzero digit lands in one bucket (PAD = N)
    s_eq = [12345678901234567890] * n
    assert run_msm(pts, s_eq) == F.p_msm(s_eq, pts)
    # zero-heavy: only first 2 nonzero (commit to a degree-1 poly padded to n)
    s_sparse = [7, 11] + [0] * (n - 2)
    assert run_msm(pts, s_sparse) == F.p_msm(s_sparse, pts)
    # all zeros
    assert run_msm(pts, [0] * n) is None
    # includes identity points
    pts2 = pts[:4] + [None] * 4
    ss = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(8)]
    assert run_msm(pts2, ss) == F.p_msm(ss, pts2[:4] + [None] * 4)
    # scalars at field boundary
    s_edge = [F.R - 1, 1, F.R - 2, 2] + [0] * 4
    assert run_msm(pts2, s_edge) == F.p_msm(s_edge[:4], pts2[:4])


def test_msm_naive_matches(rng):
    n = 16
    pts = rand_points(rng, n)
    ss = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(n)]
    P = cv.from_affine_ints(pts)
    s = FR.from_ints(ss)
    from halo_accumulation_tpu.runtime import cached_jit

    R1 = cached_jit(msm.msm_naive)(P, s)
    R2 = msm.msm(P, s)
    assert bool(np.asarray(cached_jit(cv.peq)(R1, R2)))
