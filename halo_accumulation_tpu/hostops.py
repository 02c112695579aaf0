"""Host-side group operations: native C++ backend when available, pure
Python oracle otherwise.

The protocol layers (pcdl/acc) do a handful of single-point operations per
transcript step (C' = C + a*C_bar - w'*S, H' = xi_0*H, ...).  These are
latency-bound, not throughput-bound, so they run on the host: the native
backend does a 255-bit scalar mul in ~100us vs ~1.5ms for the Python
oracle and ~1ms+ for a device round-trip."""

from __future__ import annotations

from halo_accumulation_tpu import fields as F
from halo_accumulation_tpu import native

_use_native = None


def use_native() -> bool:
    global _use_native
    if _use_native is None:
        _use_native = native.available()
    return _use_native


def p_add(P, Q):
    if use_native():
        return native.point_add(P, Q)
    return F.p_add(P, Q)


def p_mul(k: int, P):
    if use_native():
        return native.scalar_mul(k % F.R, P)
    return F.p_mul(k, P)


def p_neg(P):
    return F.p_neg(P)


def p_msm(scalars, points):
    if use_native():
        return native.msm([s % F.R for s in scalars], points)
    return F.p_msm(scalars, points)
