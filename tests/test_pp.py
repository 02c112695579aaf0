"""URS parity with the reference's hardcoded constants.

This is the strongest available end-to-end anchor for bit-exactness: it
pins SHA3 hashing, from_le_bytes_mod_order, field arithmetic, and scalar
multiplication against /root/reference/code/src/consts.rs (ground truth per
main.rs:91-100).  The reference stores limbs in arkworks Montgomery form;
we decode via v * (2^256)^-1 mod q."""

import re

import pytest

from halo_accumulation_tpu import fields as F
from halo_accumulation_tpu import pp as pp_mod

CONSTS = "/root/reference/code/src/consts.rs"


def _parse_groups(text, macro, count):
    pat = re.compile(macro + r"!\(\s*\[([^\]]+)\]\s*,\s*\[([^\]]+)\]" + (r"\s*,\s*\[([^\]]+)\]" if count == 3 else ""), re.S)
    out = []
    for m in pat.finditer(text):
        groups = []
        for g in m.groups():
            groups.append([int(x.strip()) for x in g.split(",") if x.strip()])
        out.append(groups)
    return out


def _jacobian_to_affine(x, y, z):
    """arkworks short-Weierstrass Projective is Jacobian: (X/Z^2, Y/Z^3)."""
    zi = pow(z, -1, F.Q)
    return (x * zi * zi % F.Q, y * zi * zi * zi % F.Q)


@pytest.fixture(scope="module")
def consts_text():
    with open(CONSTS) as fh:
        return fh.read()


def test_s_h_match(consts_text):
    projs = _parse_groups(consts_text.split("pub const GS")[0], "mk_proj", 3)
    assert len(projs) == 2
    sx, sy, sz = (F.from_ark_montgomery(g, F.Q) for g in projs[0])
    hx, hy, hz = (F.from_ark_montgomery(g, F.Q) for g in projs[1])
    S_ref = _jacobian_to_affine(sx, sy, sz)
    H_ref = _jacobian_to_affine(hx, hy, hz)
    # oracle-side: scalar * G
    G = (F.G_X, F.G_Y)
    assert F.p_mul(pp_mod.gen_scalar(0), G) == S_ref
    assert F.p_mul(pp_mod.gen_scalar(1), G) == H_ref


def test_gs_match_reference(consts_text, tmp_path):
    n = 64  # device-generated URS vs reference constants (and oracle)
    affs = _parse_groups(consts_text, "mk_aff", 2)
    assert len(affs) == 16384
    pp_mod.CACHE_DIR = tmp_path  # don't pollute the repo cache with n=64
    pp = pp_mod.get_pp(n, use_disk_cache=False)
    gs = pp.gs_host(n)
    for i in range(n):
        want = tuple(F.from_ark_montgomery(g, F.Q) for g in affs[i])
        assert gs[i] == want, f"G_{i} mismatch"
    # S, H from device path too
    projs = _parse_groups(consts_text.split("pub const GS")[0], "mk_proj", 3)
    S_ref = _jacobian_to_affine(*(F.from_ark_montgomery(g, F.Q) for g in projs[0]))
    H_ref = _jacobian_to_affine(*(F.from_ark_montgomery(g, F.Q) for g in projs[1]))
    assert pp.s == S_ref
    assert pp.h == H_ref


def test_last_gs_match(consts_text):
    """Check the tail of the reference URS against the host oracle (cheap:
    direct scalar mult of the two final generators)."""
    affs = _parse_groups(consts_text, "mk_aff", 2)
    G = (F.G_X, F.G_Y)
    for i in (16382, 16383):
        want = tuple(F.from_ark_montgomery(g, F.Q) for g in affs[i])
        assert F.p_mul(pp_mod.gen_scalar(i + 2), G) == want
