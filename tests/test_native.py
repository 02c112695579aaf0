"""Native C++ backend vs the pure-Python oracle (the backend plays the
role arkworks plays for the reference - independent fast CPU engine)."""

import hashlib

import pytest

from halo_accumulation_tpu import fields as F
from halo_accumulation_tpu import native
from halo_accumulation_tpu import pp as pp_mod

pytestmark = pytest.mark.skipif(not native.available(), reason="native backend unavailable")

G = (F.G_X, F.G_Y)


def test_sha3():
    for msg in (b"", b"a", b"hello", b"x" * 135, b"y" * 136, b"z" * 1000):
        assert native.sha3(msg) == hashlib.sha3_256(msg).digest()


def test_group_ops(rng):
    ks = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(6)]
    pts = [F.p_mul(k, G) for k in ks]
    assert native.point_add(pts[0], pts[1]) == F.p_add(pts[0], pts[1])
    assert native.point_add(pts[0], pts[0]) == F.p_add(pts[0], pts[0])
    assert native.point_add(pts[0], F.p_neg(pts[0])) is None
    assert native.point_add(None, pts[2]) == pts[2]
    assert native.scalar_mul(ks[3], pts[4]) == F.p_mul(ks[3], pts[4])
    assert native.scalar_mul(0, pts[0]) is None
    assert native.scalar_mul(F.R - 1, pts[1]) == F.p_neg(pts[1])


def test_msm(rng):
    n = 33
    ks = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(n)]
    pts = [F.p_mul(k + 1, G) for k in range(n)]
    assert native.msm(ks, pts) == F.p_msm(ks, pts)
    assert native.msm([0] * n, pts) is None
    pts2 = pts[:3] + [None] * 3
    assert native.msm(ks[:6], pts2) == F.p_msm(ks[:3], pts[:3])


def test_urs_matches_oracle():
    got = native.urs(0, 6)
    for i in range(6):
        assert got[i] == F.p_mul(pp_mod.gen_scalar(i), G)
