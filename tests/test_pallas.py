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
