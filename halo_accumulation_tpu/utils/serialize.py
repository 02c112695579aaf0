"""ark-serialize-0.5-compatible compressed encodings (host side).

The Fiat-Shamir transcript hashes ark-serialize `serialize_compressed`
bytes (/root/reference/code/src/group.rs:49,74), so byte layouts here must
match arkworks 0.5 exactly:

  * Fp/Fr: 32-byte little-endian canonical integer
    (buffer_byte_size(255) = 32).
  * Affine short-Weierstrass point, compressed: x serialized with 2 flag
    bits.  The Pasta moduli are 255-bit, so ark-ff's
    buffer_byte_size(MODULUS_BIT_SIZE + 2) = ceil(257/8) = 33 bytes: the
    x-coordinate's 32 LE bytes followed by one extra byte whose top bits
    carry the flags: bit6 = point-at-infinity (x serialized as 0), bit7 =
    y is "negative" (y > p - y, the lexicographically larger root).
    (arkworks SWFlags: YIsPositive=0, PointAtInfinity=1<<6, YIsNegative=1<<7.)
  * Projective points serialize via their affine form.
  * Vec<T>: u64 LE length prefix + elements.
  * Option<T>: 1 tag byte (0/1) + payload.
  * #[derive(CanonicalSerialize)] structs: fields in declaration order.

Environment note: the Rust toolchain is not available here, so these byte
layouts cannot be re-verified against arkworks directly; they follow the
ark-serialize 0.5 sources.  The strongest end-to-end anchor available - the
reference's hardcoded URS (consts.rs), which pins sha3 -> Fr ->
scalar-mul-of-G - is verified bit-exactly in tests/test_pp.py.
"""

from __future__ import annotations

import hashlib

from halo_accumulation_tpu import fields

SW_INFINITY = 0x40
SW_Y_NEG = 0x80


def ser_scalar(v: int) -> bytes:
    """Fr canonical 32-byte LE (ark-ff serialize of a field element)."""
    return (v % fields.R).to_bytes(32, "little")


def ser_base(v: int) -> bytes:
    return (v % fields.Q).to_bytes(32, "little")


POINT_BYTES = 33  # buffer_byte_size(255 + 2 flag bits)


def ser_point(P) -> bytes:
    """Compressed affine point (33 bytes); P is None (infinity) or (x, y)."""
    if P is None:
        b = bytearray(POINT_BYTES)
        b[32] |= SW_INFINITY
        return bytes(b)
    x, y = P[0] % fields.Q, P[1] % fields.Q
    b = bytearray(x.to_bytes(POINT_BYTES, "little"))
    if y > fields.Q - y:  # y "negative": larger of {y, -y}
        b[32] |= SW_Y_NEG
    return bytes(b)


def deser_point(b: bytes):
    """Inverse of ser_point. Returns None or (x, y)."""
    assert len(b) == POINT_BYTES
    flags = b[32] & 0xC0
    if flags & SW_INFINITY:
        return None
    x = int.from_bytes(bytes(b[:32]) + bytes([b[32] & 0x3F]), "little")
    rhs = (pow(x, 3, fields.Q) + fields.B_COEFF) % fields.Q
    y = fields.sqrt_mod(rhs, fields.Q)
    if y is None:
        raise ValueError("x is not on the curve")
    neg = fields.Q - y
    y_big, y_small = max(y, neg), min(y, neg)
    return (x, y_big if flags & SW_Y_NEG else y_small)


def ser_u64(n: int) -> bytes:
    return int(n).to_bytes(8, "little")


def ser_vec(items: list[bytes]) -> bytes:
    return ser_u64(len(items)) + b"".join(items)


def ser_option(item: bytes | None) -> bytes:
    return b"\x00" if item is None else b"\x01" + item


def ser_scalar_vec(vs) -> bytes:
    return ser_vec([ser_scalar(v) for v in vs])


def ser_poly(coeffs) -> bytes:
    """ark-poly DensePolynomial { coeffs: Vec<F> }."""
    return ser_scalar_vec(coeffs)


def sha3_256(data: bytes) -> bytes:
    return hashlib.sha3_256(data).digest()
