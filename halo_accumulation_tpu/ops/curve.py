"""Vectorized Pallas-curve group ops (complete projective formulas), in JAX.

Replaces the reference's use of arkworks ark-ec Jacobian arithmetic
(/root/reference/code/src/group.rs:7-26 type aliases; all +/* point ops).

TPU-native choices:
  * Homogeneous projective coordinates with the *complete* addition laws of
    Renes-Costello-Batina 2016 (algorithms 7/8/9 specialized to a=0, b=5).
    Complete formulas are branchless - they handle P==Q, P==-Q and the
    identity (0:1:0) uniformly - which is exactly what a SIMD lane needs;
    arkworks instead branches per point, which would be poison on the VPU.
  * Points-as-structure-of-arrays: a point vector is a tuple (X, Y, Z) of
    (16, *batch) uint32 limb arrays, so every field op vectorizes over the
    batch axis.
  * b3 = 3*b = 15 multiplications are done as cheap mul-by-constant limb
    scalings, not full field muls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from halo_accumulation_tpu.ops.field import FQ, FR, L, U32

B3 = 15  # 3 * b for y^2 = x^3 + 5


class PointVec(NamedTuple):
    """Projective point(s): X, Y, Z limb arrays of shape (16, *batch)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[1:]


def identity(batch_shape=()) -> PointVec:
    return PointVec(FQ.zeros(batch_shape), FQ.from_int(1, batch_shape), FQ.zeros(batch_shape))


def from_affine_ints(points) -> PointVec:
    """Host list of (x, y) int pairs or None (infinity) -> PointVec."""
    xs, ys, zs = [], [], []
    for P in points:
        if P is None:
            xs.append(0), ys.append(1), zs.append(0)
        else:
            xs.append(P[0]), ys.append(P[1]), zs.append(1)
    return PointVec(FQ.from_ints(xs), FQ.from_ints(ys), FQ.from_ints(zs))


def padd(P: PointVec, Q: PointVec) -> PointVec:
    """Complete projective addition, RCB16 algorithm 7 (a=0), 12M + 2m(b3).

    Mirrors the semantics of arkworks' `Projective + Projective` used all
    over /root/reference/code/src/pcdl.rs (e.g. :218, :291-298)."""
    f = FQ
    x1, y1, z1 = P
    x2, y2, z2 = Q
    t0 = f.mul(x1, x2)
    t1 = f.mul(y1, y2)
    t2 = f.mul(z1, z2)
    t3 = f.mul(f.add(x1, y1), f.add(x2, y2))
    t4 = f.add(t0, t1)
    t3 = f.sub(t3, t4)  # x1y2 + x2y1
    t4 = f.mul(f.add(y1, z1), f.add(y2, z2))
    x3 = f.add(t1, t2)
    t4 = f.sub(t4, x3)  # y1z2 + y2z1
    x3 = f.mul(f.add(x1, z1), f.add(x2, z2))
    y3 = f.add(t0, t2)
    y3 = f.sub(x3, y3)  # x1z2 + x2z1
    x3 = f.add(t0, t0)
    t0 = f.add(x3, t0)  # 3 x1x2
    t2 = f.mul_small(t2, B3)  # b3 z1z2
    z3 = f.add(t1, t2)
    t1 = f.sub(t1, t2)
    y3 = f.mul_small(y3, B3)  # b3 (x1z2 + x2z1)
    x3 = f.mul(t4, y3)
    t2 = f.mul(t3, t1)
    x3 = f.sub(t2, x3)
    y3 = f.mul(y3, t0)
    t1 = f.mul(t1, z3)
    y3 = f.add(t1, y3)
    t0 = f.mul(t0, t3)
    z3 = f.mul(z3, t4)
    z3 = f.add(z3, t0)
    return PointVec(x3, y3, z3)


def padd_mixed(P: PointVec, qx, qy, q_inf=None) -> PointVec:
    """Complete mixed addition P + (qx, qy, 1), RCB16 algorithm 8 (a=0),
    11M + 2m(b3).  If q_inf (bool mask over batch) is given, those lanes
    return P unchanged (affine points cannot encode the identity)."""
    f = FQ
    x1, y1, z1 = P
    t0 = f.mul(x1, qx)
    t1 = f.mul(y1, qy)
    t3 = f.mul(f.add(x1, y1), f.add(qx, qy))
    t3 = f.sub(t3, f.add(t0, t1))  # x1y2 + x2y1
    t4 = f.add(f.mul(qy, z1), y1)  # y1 + y2z1
    y3 = f.add(f.mul(qx, z1), x1)  # x1 + x2z1
    x3 = f.add(t0, t0)
    t0 = f.add(x3, t0)  # 3 x1x2
    t2 = f.mul_small(z1, B3)
    z3 = f.add(t1, t2)
    t1 = f.sub(t1, t2)
    y3 = f.mul_small(y3, B3)
    x3 = f.mul(t4, y3)
    t2 = f.mul(t3, t1)
    x3 = f.sub(t2, x3)
    y3 = f.mul(y3, t0)
    t1 = f.mul(t1, z3)
    y3 = f.add(t1, y3)
    t0 = f.mul(t0, t3)
    z3 = f.mul(z3, t4)
    z3 = f.add(z3, t0)
    R = PointVec(x3, y3, z3)
    if q_inf is not None:
        R = pselect(q_inf, P, R)
    return R


def pdbl(P: PointVec) -> PointVec:
    """Complete projective doubling, RCB16 algorithm 9 (a=0), 6M + 2S."""
    f = FQ
    x, y, z = P
    t0 = f.mul(y, y)
    z3 = f.add(t0, t0)
    z3 = f.add(z3, z3)
    z3 = f.add(z3, z3)  # 8 y^2
    t1 = f.mul(y, z)
    t2 = f.mul(z, z)
    t2 = f.mul_small(t2, B3)  # b3 z^2
    x3 = f.mul(t2, z3)
    y3 = f.add(t0, t2)
    z3 = f.mul(t1, z3)
    t1 = f.add(t2, t2)
    t2 = f.add(t1, t2)
    t0 = f.sub(t0, t2)
    y3 = f.mul(t0, y3)
    y3 = f.add(x3, y3)
    t1 = f.mul(x, y)
    x3 = f.mul(t0, t1)
    x3 = f.add(x3, x3)
    return PointVec(x3, y3, z3)


def pneg(P: PointVec) -> PointVec:
    return PointVec(P.x, FQ.neg(P.y), P.z)


def pselect(m, A: PointVec, B: PointVec) -> PointVec:
    """where(m, A, B) with m broadcastable over the batch shape."""
    return PointVec(FQ.select(m, A.x, B.x), FQ.select(m, A.y, B.y), FQ.select(m, A.z, B.z))


def is_identity(P: PointVec):
    return FQ.is_zero(P.z)


def peq(P: PointVec, Q: PointVec):
    """Projective equality: x1 z2 == x2 z1 and y1 z2 == y2 z1 (homogeneous
    coords, Z=0 only at the identity where X=0 too)."""
    f = FQ
    ex = f.eq(f.mul(P.x, Q.z), f.mul(Q.x, P.z))
    ey = f.eq(f.mul(P.y, Q.z), f.mul(Q.y, P.z))
    both_inf = is_identity(P) & is_identity(Q)
    return (ex & ey) | both_inf


def to_affine(P: PointVec):
    """Batch-normalize: returns (x, y, inf_mask) with x,y canonical limbs.
    Uses one tree-batched inversion (Montgomery-trick equivalent)."""
    f = FQ
    zinv = f.inv(P.z)  # 0 stays 0
    x = f.canon(f.mul(P.x, zinv))
    y = f.canon(f.mul(P.y, zinv))
    return x, y, is_identity(P)


def sum_points(P: PointVec, axis: int = 0) -> PointVec:
    """Tree-reduce one batch axis with complete adds."""
    ax = axis + 1
    while P.x.shape[ax] > 1:
        n = P.x.shape[ax]
        half = n // 2
        lo = PointVec(*(jax.lax.slice_in_dim(c, 0, half, axis=ax) for c in P))
        hi = PointVec(*(jax.lax.slice_in_dim(c, half, 2 * half, axis=ax) for c in P))
        s = padd(lo, hi)
        if n % 2:
            tail = PointVec(*(jax.lax.slice_in_dim(c, 2 * half, n, axis=ax) for c in P))
            s = PointVec(*(jnp.concatenate([a, b], axis=ax) for a, b in zip(s, tail)))
        P = s
    return PointVec(*(jnp.squeeze(c, axis=ax) for c in P))


def scalar_bits_msb(k_limbs, nbits: int = 255):
    """Traced Fr limb vector (16,) -> bool bits array (nbits,), MSB first."""
    idx = np.arange(nbits - 1, -1, -1)
    limb_idx = jnp.asarray(idx // 16, jnp.int32)
    bit_idx = jnp.asarray((idx % 16).astype(np.uint32))
    return ((k_limbs[limb_idx] >> bit_idx) & 1).astype(jnp.bool_)


def pmul_shared(k_limbs, P: PointVec, nbits: int = 255) -> PointVec:
    """Multiply every point in the vector by the SAME traced scalar k (Fr
    canonical limbs, shape (16,)).  Used by the IPA fold
    (/root/reference/code/src/pcdl.rs:216-224 does one Rust scalar-mul per
    point; here one shared double-and-add sweep runs across all lanes).

    2-bit windows: table {0,P,2P,3P}, per window 2 doublings + 1 complete
    add (adding the identity for zero digits is safe)."""
    nwin = (nbits + 1) // 2
    P2 = pdbl(P)
    P3 = padd(P2, P)
    table = PointVec(
        jnp.stack([identity(P.batch_shape).x, P.x, P2.x, P3.x]),
        jnp.stack([identity(P.batch_shape).y, P.y, P2.y, P3.y]),
        jnp.stack([identity(P.batch_shape).z, P.z, P2.z, P3.z]),
    )  # (4, 16, *batch)

    def body2(i, acc):
        acc = pdbl(pdbl(acc))
        sh = 2 * (nwin - 1 - i)
        limb = k_limbs[sh // 16]
        d = (limb >> (sh % 16).astype(jnp.uint32)) & jnp.uint32(3)
        T = PointVec(
            jax.lax.dynamic_index_in_dim(table.x, d.astype(jnp.int32), 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(table.y, d.astype(jnp.int32), 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(table.z, d.astype(jnp.int32), 0, keepdims=False),
        )
        return padd(acc, T)

    return jax.lax.fori_loop(0, nwin, body2, identity(P.batch_shape))


def gather_points(P: PointVec, idx, axis: int = 0) -> PointVec:
    """Gather along a batch axis."""
    ax = axis + 1
    return PointVec(
        jnp.take(P.x, idx, axis=ax), jnp.take(P.y, idx, axis=ax), jnp.take(P.z, idx, axis=ax)
    )
