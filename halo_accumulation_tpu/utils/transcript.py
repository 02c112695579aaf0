"""Fiat-Shamir transcript: rho_0 / rho_1 oracles (host side).

Bit-exact mirror of /root/reference/code/src/group.rs:41-89:

    rho_b(a_1, .., a_n) = Fr::from_le_bytes_mod_order(
        SHA3-256( ser(a_1) || ... || ser(a_n) || (b as u32).to_le_bytes() ))

Note the domain-separation tag is APPENDED (group.rs:54,79), which
contradicts the report's spec (report.md:148) - the code is authoritative.

Hashing runs on the host: transcript inputs are a few dozen bytes, and all
challenges of a succinct_check depend only on proof data, so they can be
derived up front and the group work batched on device (a TPU-native
restructuring; the Rust interleaves hash and group ops).
"""

from __future__ import annotations

import hashlib

from halo_accumulation_tpu import fields
from halo_accumulation_tpu.utils import serialize as ser


def from_le_bytes_mod_order(b: bytes) -> int:
    """ark-ff PrimeField::from_le_bytes_mod_order for Fr."""
    return int.from_bytes(b, "little") % fields.R


def _rho(tag: int, parts: list[bytes]) -> int:
    h = hashlib.sha3_256()
    for p in parts:
        h.update(p)
    h.update(tag.to_bytes(4, "little"))
    return from_le_bytes_mod_order(h.digest())


def rho_0(*parts: bytes) -> int:
    return _rho(0, list(parts))


def rho_1(*parts: bytes) -> int:
    return _rho(1, list(parts))


def rho_0_scalar_point_point(xi: int, L, R) -> int:
    """xi_next = rho_0(xi_i, L_i, R_i)  (pcdl.rs:212,293)."""
    return rho_0(ser.ser_scalar(xi), ser.ser_point(L), ser.ser_point(R))
