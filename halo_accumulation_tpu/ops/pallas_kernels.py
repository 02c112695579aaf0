"""Pallas TPU kernels for the field/curve hot paths.

XLA compiles the stacked-limb field ops (ops/field.py) into many small
fusions with HBM round-trips between them: measured ~38 Mfm/s against a
~670 Gop/s u32-multiply roofline (tools/tpu_mulprobe.py), i.e. >10x left
on the table.  These kernels hand-fuse a full modular multiply / complete
point add over a VMEM-resident tile using the list-form limb math
(ops/limbs.py - one array per limb, no pad/concat), so every intermediate
stays on-chip.

Layout: limb arrays are reshaped (L, N) -> (L, N/128, 128) so each limb is
a clean (sublane, lane) tile; blocks carry TN = _BLOCK_ROWS * 128 lanes.

Enabled on TPU by default (HALO_TPU_PALLAS=0 disables); on CPU the kernels
run through the Pallas interpreter for parity tests only (production CPU
paths keep the XLA ops)."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from halo_accumulation_tpu.ops import limbs
from halo_accumulation_tpu.ops.field import FQ, L

try:  # pallas TPU backend (interpreter elsewhere)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover - pallas always importable in jax>=0.4
    HAVE_PALLAS = False

_LF = limbs.ListField(FQ)


def _block_rows() -> int:
    """8 x 128 lanes per grid step on TPU; 1 x 128 under the (slow) CPU
    interpreter so parity tests stay fast."""
    return 8 if jax.default_backend() == "tpu" else 1


def enabled() -> bool:
    if not HAVE_PALLAS:
        return False
    return os.environ.get("HALO_TPU_PALLAS", "1") != "0"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _split(ref):
    return [ref[i] for i in range(L)]


def _store(ref, limbs_list):
    for i in range(L):
        ref[i] = limbs_list[i]


def _fmul_kernel(a_ref, b_ref, o_ref):
    _store(o_ref, _LF.mul(_split(a_ref), _split(b_ref)))


def _padd_kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
    P = padd_limbs((_split(x1), _split(y1), _split(z1)), (_split(x2), _split(y2), _split(z2)))
    _store(ox, P[0])
    _store(oy, P[1])
    _store(oz, P[2])


def padd_limbs(P1, P2):
    return limbs.padd_list(_LF, P1, P2)


def _tile(a):
    Lx, N = a.shape
    return a.reshape(Lx, N // 128, 128)


def _untile(a):
    Lx, R, _ = a.shape
    return a.reshape(Lx, R * 128)


def _pad_lanes(arrs, tn):
    """Zero-pad the lane axis of each (L, N) array up to the next
    {2^k, 3*2^(k-1)} multiple of tn: bounds the set of kernel shapes (each
    distinct shape is a separate Mosaic compile, ~10 s through the
    remote-compile tunnel) while capping padding waste at ~33% (pure
    powers of two wasted up to 2x on the tree-reduce level widths)."""
    N = arrs[0].shape[1]
    Np = tn
    while Np < N:
        # 3*Np/2 must stay a multiple of the block width tn
        if Np >= 2 * tn and 3 * Np // 2 >= N:
            Np = 3 * Np // 2
            break
        Np *= 2
    if Np == N:
        return arrs, N
    return [jnp.pad(a, ((0, 0), (0, Np - N))) for a in arrs], N


@functools.partial(jax.jit, static_argnames=("interpret", "br"))
def _fmul_call(a3, b3, interpret: bool, br: int = 8):
    R = a3.shape[1]
    spec = pl.BlockSpec((L, br, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fmul_kernel,
        out_shape=jax.ShapeDtypeStruct(a3.shape, jnp.uint32),
        grid=(R // br,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a3, b3)


def fmul(a, b):
    """Modular multiply via one Pallas kernel: (L, N) x (L, N) -> (L, N).
    Bit-identical to FQ.mul (tests/test_pallas.py)."""
    br = _block_rows()
    (a, b), N = _pad_lanes([a, b], br * 128)
    out = _fmul_call(_tile(a), _tile(b), _interpret(), br)
    return _untile(out)[:, :N]


@functools.partial(jax.jit, static_argnames=("interpret", "br"))
def _padd_call(arrs, interpret: bool, br: int = 8):
    spec = pl.BlockSpec((L, br, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    R = arrs[0].shape[1]
    shape = jax.ShapeDtypeStruct(arrs[0].shape, jnp.uint32)
    return pl.pallas_call(
        _padd_kernel,
        out_shape=(shape, shape, shape),
        grid=(R // br,),
        in_specs=[spec] * 6,
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(*arrs)


def padd(P1, P2):
    """Complete projective add via one Pallas kernel.  P1/P2: tuples of
    (L, N) coordinate arrays; returns the same."""
    br = _block_rows()
    arrs, N = _pad_lanes([*P1, *P2], br * 128)
    ox, oy, oz = _padd_call(tuple(_tile(a) for a in arrs), _interpret(), br)
    return tuple(_untile(o)[:, :N] for o in (ox, oy, oz))


# ---------------------------------------------------------------------------
# Bucket-accumulation kernel for the row-permutation MSM (ops/msm.py).
#
# Input: the gathered scatter matrix laid out (lanes, pad, R, 128) u32 where
# lanes is a row-table width (40 = affine x||y||z-indicator, 64 = projective
# x||y||z||pad) and R*128 = padded column count.  The kernel reduces the pad
# axis with complete point adds INSIDE one Mosaic kernel: grid is
# (R//br, pad) with the pad axis innermost and the output block revisited
# across it (index map ignores p), so the accumulator lives in VMEM for the
# whole column sweep and the reduction costs ONE kernel compile instead of
# the log2(pad) per-level XLA dispatch tree the round-3 path unrolled (the
# >1200 s compile that killed BENCH_r03).


def _bucket_kernel_aff(in_ref, ox, oy, oz):
    p = pl.program_id(1)
    xs = [in_ref[i, 0] for i in range(L)]
    ys = [in_ref[L + i, 0] for i in range(L)]
    z0 = in_ref[2 * L, 0]  # 1 for real rows, 0 for the identity sentinel
    zero = z0 - z0
    zs = [z0] + [zero] * (L - 1)

    @pl.when(p == 0)
    def _():
        # identity accumulator (0 : 1 : 0)
        for i in range(L):
            ox[i] = zero
            oy[i] = zero + jnp.uint32(1) if i == 0 else zero
            oz[i] = zero

    acc = (_split(ox), _split(oy), _split(oz))
    nx, ny, nz = padd_limbs(acc, (xs, ys, zs))
    _store(ox, nx)
    _store(oy, ny)
    _store(oz, nz)


def _bucket_kernel_proj(in_ref, ox, oy, oz):
    p = pl.program_id(1)
    xs = [in_ref[i, 0] for i in range(L)]
    ys = [in_ref[L + i, 0] for i in range(L)]
    zs = [in_ref[2 * L + i, 0] for i in range(L)]
    zero = xs[0] - xs[0]

    @pl.when(p == 0)
    def _():
        for i in range(L):
            ox[i] = zero
            oy[i] = zero + jnp.uint32(1) if i == 0 else zero
            oz[i] = zero

    acc = (_split(ox), _split(oy), _split(oz))
    nx, ny, nz = padd_limbs(acc, (xs, ys, zs))
    _store(ox, nx)
    _store(oy, ny)
    _store(oz, nz)


@functools.partial(jax.jit, static_argnames=("lanes", "interpret", "br"))
def _bucket_call(Mt, lanes: int, interpret: bool, br: int = 8):
    _, pad, R, _ = Mt.shape
    in_spec = pl.BlockSpec(
        (lanes, 1, br, 128), lambda j, p: (0, p, j, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((L, br, 128), lambda j, p: (0, j, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, R, 128), jnp.uint32)
    kern = _bucket_kernel_aff if lanes == 40 else _bucket_kernel_proj
    return pl.pallas_call(
        kern,
        out_shape=(shape, shape, shape),
        grid=(R // br, pad),
        in_specs=[in_spec],
        out_specs=(out_spec, out_spec, out_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(Mt)


def bucket_accum(Mt):
    """Reduce the pad axis of a gathered row matrix with complete adds.

    Mt: (lanes, pad, colsP) u32 with colsP a multiple of br*128 and lanes in
    {40, 64} (see ops/msm.rows_from_affine / rows_from_points).  Returns
    (x, y, z) each (L, colsP): per-column bucket sums."""
    lanes, pad, colsP = Mt.shape
    br = _block_rows()
    assert colsP % (br * 128) == 0, colsP
    Mt4 = Mt.reshape(lanes, pad, colsP // 128, 128)
    ox, oy, oz = _bucket_call(Mt4, lanes, _interpret(), br)
    return tuple(o.reshape(L, colsP) for o in (ox, oy, oz))


# ---------------------------------------------------------------------------
# MASKED bucket accumulation for the sort-payload MSM (ops/msm.py sortrows
# pipeline).  Input is point data in SORTED-by-digit order, block-gathered at
# 8-row granularity (8x fewer gather indexes - the per-element gather was the
# dominant MSM cost, ~60 ns/index: tools/tpu_gather_probe.py).  Because block
# alignment pulls in up to 7 rows of the neighboring buckets, each column
# carries (off, len) metadata packed off | len << 3 in one u32; slot p is
# live iff off <= p < off + len, dead slots are replaced by the identity
# in-kernel.  lanes = 36 (affine x||y, Z synthesized as the mask) or 54
# (projective x||y||z).


def _bucket_kernel_masked(aff: bool, meta_ref, in_ref, ox, oy, oz):
    p = pl.program_id(1)
    meta = meta_ref[0]  # (br, 128) u32
    off = meta & jnp.uint32(7)
    ln = meta >> jnp.uint32(3)
    pv = jnp.uint32(p)
    cond = (pv >= off) & (pv < off + ln)
    zero = meta - meta
    one = zero + jnp.uint32(1)
    if aff:
        # pair-packed canonical affine rows (msm.planes_from_affine):
        # lane k holds limbs 2k | 2k+1 << 15 of x||y; Z synthesized
        mask15 = jnp.uint32(0x7FFF)
        raw = [in_ref[i, 0] for i in range(L)]
        lim = []
        for k in range(2 * L):
            v = raw[k // 2]
            lim.append((v >> jnp.uint32(15)) & mask15 if k % 2 else v & mask15)
        xs = [jnp.where(cond, lim[i], zero) for i in range(L)]
        ys = [jnp.where(cond, lim[L], one)] + [
            jnp.where(cond, lim[L + i], zero) for i in range(1, L)
        ]
        zs = [jnp.where(cond, one, zero)] + [zero] * (L - 1)
    else:
        xs = [jnp.where(cond, in_ref[i, 0], zero) for i in range(L)]
        ys = [jnp.where(cond, in_ref[L, 0], one)] + [
            jnp.where(cond, in_ref[L + i, 0], zero) for i in range(1, L)
        ]
        zs = [jnp.where(cond, in_ref[2 * L + i, 0], zero) for i in range(L)]

    @pl.when(p == 0)
    def _():
        for i in range(L):
            ox[i] = zero
            oy[i] = one if i == 0 else zero
            oz[i] = zero

    acc = (_split(ox), _split(oy), _split(oz))
    nx, ny, nz = padd_limbs(acc, (xs, ys, zs))
    _store(ox, nx)
    _store(oy, ny)
    _store(oz, nz)


@functools.partial(jax.jit, static_argnames=("lanes", "interpret", "br"))
def _bucket_masked_call(Mt, meta, lanes: int, interpret: bool, br: int = 8):
    _, pad, R, _ = Mt.shape
    in_spec = pl.BlockSpec(
        (lanes, 1, br, 128), lambda j, p: (0, p, j, 0), memory_space=pltpu.VMEM
    )
    meta_spec = pl.BlockSpec((1, br, 128), lambda j, p: (0, j, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((L, br, 128), lambda j, p: (0, j, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, R, 128), jnp.uint32)
    kern = functools.partial(_bucket_kernel_masked, lanes == L)
    return pl.pallas_call(
        kern,
        out_shape=(shape, shape, shape),
        grid=(R // br, pad),
        in_specs=[meta_spec, in_spec],
        out_specs=(out_spec, out_spec, out_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(meta, Mt)


def bucket_accum_masked(Mt, meta):
    """Reduce the pad axis of sort-ordered block-gathered point data.

    Mt: (lanes, pad, colsP) u32, lanes in {L=18 (pair-packed affine), 3L=54
    (projective)}, colsP a multiple of br*128; meta: (1, colsP) u32 with
    off | len << 3 per column.  Returns
    (x, y, z) each (L, colsP): per-column bucket sums with complete adds,
    dead slots contributing the identity."""
    lanes, pad, colsP = Mt.shape
    br = _block_rows()
    assert colsP % (br * 128) == 0, colsP
    Mt4 = Mt.reshape(lanes, pad, colsP // 128, 128)
    meta3 = meta.reshape(1, colsP // 128, 128)
    ox, oy, oz = _bucket_masked_call(Mt4, meta3, lanes, _interpret(), br)
    return tuple(o.reshape(L, colsP) for o in (ox, oy, oz))


def _pdbl_kernel(x, y, z, ox, oy, oz):
    P = limbs.pdbl_list(_LF, (_split(x), _split(y), _split(z)))
    _store(ox, P[0])
    _store(oy, P[1])
    _store(oz, P[2])


@functools.partial(jax.jit, static_argnames=("interpret", "br"))
def _pdbl_call(arrs, interpret: bool, br: int = 8):
    spec = pl.BlockSpec((L, br, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    R = arrs[0].shape[1]
    shape = jax.ShapeDtypeStruct(arrs[0].shape, jnp.uint32)
    return pl.pallas_call(
        _pdbl_kernel,
        out_shape=(shape, shape, shape),
        grid=(R // br,),
        in_specs=[spec] * 3,
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(*arrs)


def pdbl(P):
    """Complete projective double via one Pallas kernel."""
    br = _block_rows()
    arrs, N = _pad_lanes(list(P), br * 128)
    ox, oy, oz = _pdbl_call(tuple(_tile(a) for a in arrs), _interpret(), br)
    return tuple(_untile(o)[:, :N] for o in (ox, oy, oz))


