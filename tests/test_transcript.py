"""Serialization + transcript format tests.

Byte layouts follow ark-serialize 0.5 (see utils/serialize.py docstring);
the hash->scalar path is independently pinned by the URS parity tests
(test_pp.py exercises sha3 || u64-LE || from_le_bytes_mod_order against
consts.rs ground truth)."""

import hashlib

from halo_accumulation_tpu import fields as F
from halo_accumulation_tpu.utils import serialize as ser
from halo_accumulation_tpu.utils import transcript as tr


def test_scalar_layout():
    assert ser.ser_scalar(1) == b"\x01" + b"\x00" * 31
    assert ser.ser_scalar(F.R + 5) == b"\x05" + b"\x00" * 31  # canonical
    v = 0x0123456789ABCDEF
    assert ser.ser_scalar(v)[:8] == v.to_bytes(8, "little")


def test_point_layout_roundtrip(rng):
    G = (F.G_X, F.G_Y)
    pts = [None, G] + [F.p_mul(int.from_bytes(rng.bytes(40), "little") % F.R, G) for _ in range(8)]
    for P in pts:
        b = ser.ser_point(P)
        assert len(b) == 33
        assert ser.deser_point(b) == P
    # infinity flag bit 6 of final byte
    assert ser.ser_point(None)[32] == 0x40
    # y-sign flag: P and -P differ exactly in bit 7
    b1, b2 = ser.ser_point(G), ser.ser_point(F.p_neg(G))
    assert b1[:32] == b2[:32]
    assert (b1[32] ^ b2[32]) == 0x80


def test_rho_tag_appended():
    """rho_b = sha3(data || tag_u32_le), tag appended (group.rs:54,79)."""
    data = ser.ser_scalar(42)
    want0 = int.from_bytes(hashlib.sha3_256(data + (0).to_bytes(4, "little")).digest(), "little") % F.R
    want1 = int.from_bytes(hashlib.sha3_256(data + (1).to_bytes(4, "little")).digest(), "little") % F.R
    assert tr.rho_0(data) == want0
    assert tr.rho_1(data) == want1
    assert want0 != want1


def test_vec_option_layout():
    assert ser.ser_vec([]) == (0).to_bytes(8, "little")
    assert ser.ser_vec([b"ab"]) == (1).to_bytes(8, "little") + b"ab"
    assert ser.ser_option(None) == b"\x00"
    assert ser.ser_option(b"x") == b"\x01x"


def test_evalproof_roundtrip(rng):
    from halo_accumulation_tpu.pcdl import EvalProof

    G = (F.G_X, F.G_Y)
    mk = lambda: F.p_mul(int.from_bytes(rng.bytes(40), "little") % F.R, G)
    pi = EvalProof(
        Ls=[mk(), mk()], Rs=[mk(), None], U=mk(), c=12345, C_bar=mk(), w_prime=999
    )
    assert EvalProof.deserialize(pi.serialize()) == pi
    pi2 = EvalProof(Ls=[mk()], Rs=[mk()], U=mk(), c=7, C_bar=None, w_prime=None)
    assert EvalProof.deserialize(pi2.serialize()) == pi2
