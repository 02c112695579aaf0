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
    (L=18, *batch) uint32 limb arrays, so every field op vectorizes over the
    batch axis.
  * b3 = 3*b = 15 multiplications are done as cheap mul-by-constant limb
    scalings, not full field muls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from halo_accumulation_tpu.ops.field import FQ, L

B3 = 15  # 3 * b for y^2 = x^3 + 5


class PointVec(NamedTuple):
    """Projective point(s): X, Y, Z limb arrays of shape (L=18, *batch)."""

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


def _stk(*xs):
    return jnp.stack(xs, axis=1)  # (L, k, *batch)


def _unstk(a, k):
    return [a[:, i] for i in range(k)]


def _pallas_route(*arrs) -> bool:
    """Route through the hand-fused Pallas kernels on TPU for wide batches:
    measured ~44x over the XLA elementwise path (tools/tpu_pallas_check.py,
    129 vs 2.9 Mpadd/s - XLA splits the limb math into many small fusions
    with HBM round-trips).  Trace-time decision: backend and shapes are
    static under jit."""
    from halo_accumulation_tpu.ops import pallas_kernels as pk

    if not pk.enabled():
        return False
    import jax

    if jax.default_backend() != "tpu":
        return False
    n = 1
    for s in arrs[0].shape[1:]:
        n *= s
    # 256+ lanes: even padded to the kernel's 1024-lane floor, the fused
    # kernel beats the ~40x-slower XLA elementwise path (verify paths run
    # row-MSMs at a few hundred lanes - round-2's hidden fast-path cost)
    return n >= 256


def padd(P: PointVec, Q: PointVec) -> PointVec:
    """Complete projective addition, RCB16 algorithm 7 (a=0), 12M + 2m(b3).

    Mirrors the semantics of arkworks' `Projective + Projective` used all
    over /root/reference/code/src/pcdl.rs (e.g. :218, :291-298).

    On TPU, wide batches run as ONE hand-fused Pallas kernel
    (ops/pallas_kernels.py).  On the XLA path the field muls are grouped
    into two stacked mul calls (and the adds/subs likewise): HLO graph
    size is per-call, not per-limb-op, so this keeps kernels that inline
    many point adds compilable."""
    if P.x.shape == Q.x.shape and _pallas_route(P.x):
        from halo_accumulation_tpu.ops import pallas_kernels as pk

        sh = P.x.shape
        flat = lambda a: a.reshape(L, -1)  # noqa: E731
        ox, oy, oz = pk.padd(
            (flat(P.x), flat(P.y), flat(P.z)), (flat(Q.x), flat(Q.y), flat(Q.z))
        )
        return PointVec(ox.reshape(sh), oy.reshape(sh), oz.reshape(sh))
    f = FQ
    x1, y1, z1 = P
    x2, y2, z2 = Q
    s1, s2, s3 = _unstk(f.add(_stk(x1, y1, x1), _stk(y1, z1, z1)), 3)
    s4, s5, s6 = _unstk(f.add(_stk(x2, y2, x2), _stk(y2, z2, z2)), 3)
    # batched muls: t0=x1x2, t1=y1y2, t2=z1z2, m3..m5 the cross terms
    t0, t1, t2, m3, m4, m5 = _unstk(f.mul(_stk(x1, y1, z1, s1, s2, s3), _stk(x2, y2, z2, s4, s5, s6)), 6)
    # t3 = m3-t0-t1 (x1y2+x2y1), t4 = m4-t1-t2 (y1z2+y2z1), w = m5-t0-t2
    sums = f.add(_stk(t0, t1, t0), _stk(t1, t2, t2))
    t3, t4, w = _unstk(f.sub(_stk(m3, m4, m5), sums), 3)
    t2b, wb = _unstk(f.mul_small(_stk(t2, w), B3), 2)  # b3 z1z2, b3 w
    t0x = f.add(t0, t0)
    t0b = f.add(t0x, t0)  # 3 x1x2
    z3s = f.add(t1, t2b)
    t1b = f.sub(t1, t2b)
    # second mul wave
    x3a, t2c, y3a, t1c, t0c, z3c = _unstk(
        f.mul(_stk(t4, t3, wb, t1b, t0b, z3s), _stk(wb, t1b, t0b, z3s, t3, t4)), 6
    )
    r1, r2 = _unstk(f.add(_stk(t1c, z3c), _stk(y3a, t0c)), 2)
    x3 = f.sub(t2c, x3a)
    return PointVec(x3, r1, r2)


def padd_mixed(P: PointVec, qx, qy, q_inf=None) -> PointVec:
    """Complete mixed addition P + (qx, qy, 1), RCB16 algorithm 8 (a=0),
    11M + 2m(b3), muls grouped into two stacked calls.  If q_inf (bool mask
    over batch) is given, those lanes return P unchanged (affine points
    cannot encode the identity)."""
    f = FQ
    x1, y1, z1 = P
    s1, s4 = _unstk(f.add(_stk(x1, qx), _stk(y1, qy)), 2)
    t0, t1, m3, y2z1, x2z1 = _unstk(
        f.mul(_stk(x1, y1, s1, z1, z1), _stk(qx, qy, s4, qy, qx)), 5
    )
    t3 = f.sub(m3, f.add(t0, t1))  # x1y2 + x2y1
    t4, w = _unstk(f.add(_stk(y2z1, x2z1), _stk(y1, x1)), 2)  # y1+y2z1, x1+x2z1
    t2b, wb = _unstk(f.mul_small(_stk(z1, w), B3), 2)
    t0x = f.add(t0, t0)
    t0b = f.add(t0x, t0)  # 3 x1x2
    z3s = f.add(t1, t2b)
    t1b = f.sub(t1, t2b)
    x3a, t2c, y3a, t1c, t0c, z3c = _unstk(
        f.mul(_stk(t4, t3, wb, t1b, t0b, z3s), _stk(wb, t1b, t0b, z3s, t3, t4)), 6
    )
    r1, r2 = _unstk(f.add(_stk(t1c, z3c), _stk(y3a, t0c)), 2)
    x3 = f.sub(t2c, x3a)
    R = PointVec(x3, r1, r2)
    if q_inf is not None:
        R = pselect(q_inf, P, R)
    return R


def pdbl(P: PointVec) -> PointVec:
    """Complete projective doubling, RCB16 algorithm 9 (a=0), 6M + 2S,
    muls grouped into three stacked calls; Pallas-fused on TPU for wide
    batches (see padd)."""
    if _pallas_route(P.x):
        from halo_accumulation_tpu.ops import pallas_kernels as pk

        sh = P.x.shape
        ox, oy, oz = pk.pdbl((P.x.reshape(L, -1), P.y.reshape(L, -1), P.z.reshape(L, -1)))
        return PointVec(ox.reshape(sh), oy.reshape(sh), oz.reshape(sh))
    f = FQ
    x, y, z = P
    t0, t1, zz = _unstk(f.mul(_stk(y, y, z), _stk(y, z, z)), 3)
    t2 = f.mul_small(zz, B3)  # b3 z^2
    z38 = f.mul_small(t0, 8)  # 8 y^2
    y3s = f.add(t0, t2)
    t0a = f.sub(t0, f.mul_small(t2, 3))
    x3a, z3, xy = _unstk(f.mul(_stk(t2, t1, x), _stk(z38, z38, y)), 3)
    y3b, x3b = _unstk(f.mul(_stk(t0a, t0a), _stk(y3s, xy)), 2)
    y3 = f.add(x3a, y3b)
    x3 = f.add(x3b, x3b)
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
    """Traced Fr limb vector (L,) -> bool bits array (nbits,), MSB first."""
    idx = np.arange(nbits - 1, -1, -1)
    limb_idx = jnp.asarray(idx // 15, jnp.int32)
    bit_idx = jnp.asarray((idx % 15).astype(np.uint32))
    return ((k_limbs[limb_idx] >> bit_idx) & 1).astype(jnp.bool_)


def pmul_shared(k_limbs, P: PointVec, nbits: int = 255) -> PointVec:
    """Multiply every point in the vector by the SAME traced scalar k (Fr
    canonical limbs, shape (L,)).  Used by the IPA fold
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
        q, r = sh // 15, (sh % 15).astype(jnp.uint32)
        # window may straddle the 15-bit limb boundary (r == 14): the
        # shifted-in high limb only reaches bit >= 1 when 15 - r <= 1, so
        # the unconditional OR is exact after masking with 3.
        d = ((k_limbs[q] >> r) | (k_limbs[q + 1] << (jnp.uint32(15) - r))) & jnp.uint32(3)
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
