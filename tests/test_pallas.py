"""Pallas kernel parity: the list-form limb math and the Pallas kernels
must be bit-identical to the stacked XLA field/curve ops (which are in
turn validated against the python-int oracle in test_field/test_curve).
On the CPU test backend the kernels run through the Pallas interpreter."""

import numpy as np
import pytest

import jax.numpy as jnp

from halo_accumulation_tpu import fields as F
from halo_accumulation_tpu.ops import curve as cv, limbs, pallas_kernels as pk
from halo_accumulation_tpu.ops.field import FQ, L
from halo_accumulation_tpu.runtime import cached_jit


def rand_fq(rng, n):
    return FQ.from_ints([int.from_bytes(rng.bytes(40), "little") % F.Q for _ in range(n)])


def test_listfield_matches_stacked(rng):
    n = 64
    a = rand_fq(rng, n)
    b = rand_fq(rng, n)
    LF = limbs.ListField(FQ)
    al = [a[i] for i in range(L)]
    bl = [b[i] for i in range(L)]
    got = jnp.stack(LF.mul(al, bl))
    want = cached_jit(FQ.mul)(a, b)
    assert (np.asarray(FQ.canon(got)) == np.asarray(FQ.canon(want))).all()
    got = jnp.stack(LF.sub(al, bl))
    want = cached_jit(FQ.sub)(a, b)
    assert (np.asarray(FQ.canon(got)) == np.asarray(FQ.canon(want))).all()
    got = jnp.stack(LF.add(al, bl))
    want = cached_jit(FQ.add)(a, b)
    assert (np.asarray(FQ.canon(got)) == np.asarray(FQ.canon(want))).all()
    got = jnp.stack(LF.mul_small(al, 15))
    want = cached_jit(FQ.mul_small, 15, static_argnums=1)(a, 15)
    assert (np.asarray(FQ.canon(got)) == np.asarray(FQ.canon(want))).all()


def _rand_points(rng, n):
    G = (F.G_X, F.G_Y)
    pts = [F.p_mul(int.from_bytes(rng.bytes(40), "little") % F.R, G) for _ in range(n)]
    # sprinkle identities to exercise the complete formulas
    pts[0] = None
    pts[-1] = None
    return pts


def test_pallas_fmul_parity(rng):
    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    n = 300  # non-multiple of the 1024-lane tile: exercises padding
    a = rand_fq(rng, n)
    b = rand_fq(rng, n)
    got = pk.fmul(a, b)
    want = cached_jit(FQ.mul)(a, b)
    assert (np.asarray(FQ.canon(got)) == np.asarray(FQ.canon(want))).all()


def test_padd_pdbl_list_parity(rng):
    """The list-form point formulas (the body of the Pallas padd/pdbl
    kernels) == the stacked curve ops, including identity lanes.  Runs as
    plain jnp (the Pallas interpreter is far too slow for the full padd on
    CPU; the kernel plumbing itself is covered by test_pallas_fmul_parity
    and on-TPU by tools/tpu_pallas_check.py)."""
    n = 32
    P = cv.from_affine_ints(_rand_points(rng, n))
    Q = cv.from_affine_ints(_rand_points(rng, n))
    LF = limbs.ListField(FQ)
    tolist = lambda a: [a[i] for i in range(L)]  # noqa: E731
    gx, gy, gz = limbs.padd_list(
        LF,
        (tolist(P.x), tolist(P.y), tolist(P.z)),
        (tolist(Q.x), tolist(Q.y), tolist(Q.z)),
    )
    got = cv.PointVec(jnp.stack(gx), jnp.stack(gy), jnp.stack(gz))
    want = cached_jit(cv.padd)(P, Q)
    assert bool(np.asarray(cached_jit(cv.peq)(got, want)).all())
    dx, dy, dz = limbs.pdbl_list(LF, (tolist(P.x), tolist(P.y), tolist(P.z)))
    got = cv.PointVec(jnp.stack(dx), jnp.stack(dy), jnp.stack(dz))
    want = cached_jit(cv.pdbl)(P)
    assert bool(np.asarray(cached_jit(cv.peq)(got, want)).all())


@pytest.mark.slow
def test_bucket_accum_parity(rng):
    """The in-kernel pad-reduction (bucket_accum, the rowperm MSM hot
    kernel) == a plain gather + tree-sum, through the Pallas interpreter on
    CPU at one small (pad=2, 128-col) grid.  Covers both row forms (affine
    40-lane with the z-indicator lane, projective 64-lane) and sentinel
    (empty-slot) handling.  Marked slow: the interpreter expands each
    in-kernel padd to thousands of host ops (~minutes on a small CPU); the
    fast-path validation of the same kernel is tools/tpu_msm_check.py and
    bench.py's rowperm-vs-staged cross-check on TPU."""
    from halo_accumulation_tpu.ops import msm as msm_mod

    n, pad, cols = 24, 2, 128
    pts = [p for p in _rand_points(rng, n + 2) if p is not None][:n]
    P = cv.from_affine_ints(pts)
    rows_aff = msm_mod.rows_from_affine(P.x, P.y)
    rows_proj = msm_mod.rows_from_points(P)
    src = np.full((pad, cols), n, np.int32)  # sentinel everywhere
    flat = rng.permutation(n)
    # scatter the n real points into random (p, col) slots
    slots = rng.choice(pad * cols, size=n, replace=False)
    for i, s in enumerate(slots):
        src[s // cols, s % cols] = flat[i]
    src = jnp.asarray(src)
    for rows in (rows_aff, rows_proj):
        ox, oy, oz = pk.bucket_accum(
            jnp.take(rows, src.reshape(-1), axis=0).T.reshape(rows.shape[1], pad, cols)
        )
        got = cv.PointVec(ox, oy, oz)
        # reference: per-column host sums via the int oracle
        import halo_accumulation_tpu.fields as F

        want_cols = [None] * cols
        for i, s in enumerate(slots):
            cidx = s % cols
            want_cols[cidx] = F.p_add(want_cols[cidx], pts[flat[i]])
        want = cv.from_affine_ints(want_cols)
        assert bool(np.asarray(cached_jit(cv.peq)(got, want)).all())
