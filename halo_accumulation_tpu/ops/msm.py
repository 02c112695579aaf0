"""Multi-scalar multiplication (Pippenger) as vectorized JAX kernels.

Replaces arkworks' VariableBaseMSM::msm_unchecked
(/root/reference/code/src/group.rs:18-26 -> pedersen.rs:14, pcdl.rs:204,208,
338, acc.rs:178) with a TPU-native formulation.  GPUs/CPUs bucket points
with scatter loops and per-thread serial accumulation; TPUs have neither
atomics nor per-lane control flow, so the bucket phase is restructured as

  sort-by-digit -> rank-in-bucket -> scatter into a (buckets x PAD) matrix
  -> identity-padded tree reduction over PAD -> suffix-scan weighted sum,

all branchless vectorized complete-adds.  Key properties:

  * Zero digits are routed to bucket 0, which carries weight 0 in the
    weighted sum: a "dump" bucket.  Rank clamping makes lanes with zero
    digits collide harmlessly there, so MSM cost scales with the number of
    *nonzero* digits - commitments to low-degree polynomials padded with
    zeros (pcdl.rs:99-110 pads to n = d+1) cost almost nothing.
  * PAD (max points per bucket) is measured on device and fixed per call on
    the host, so the kernel itself stays static-shaped; the jit cache is
    keyed on (N, c, PAD) power-of-two classes.
  * The window loop is a lax.scan from the most significant window down,
    with c doublings between windows (Horner over windows), so one compile
    covers all windows.

Staged execution (TPU workaround): the current TPU backend deterministically
miscompiles field-arithmetic programs past a certain fused-graph size - a
single kernel containing scatter + pad-reduce + suffix-scan + lane-reduce
(~25 point-add-equivalents) returns off-curve garbage at N>=1024 while every
<=17-op subgraph of it, run alone, is bit-correct (and the identical program
is correct on XLA:CPU).  msm() therefore runs Pippenger as FOUR modest
dispatches (_bucket_sums -> _suffix_mask -> _horner_windows -> _lane_reduce),
each under the empirically-safe size; arrays stay device-resident between
launches so the cost is three extra kernel launches.  The fused single-kernel
variant is kept as _pippenger for small problems and compile checks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from halo_accumulation_tpu.ops import curve as cv
from halo_accumulation_tpu.ops.field import FR, L
from halo_accumulation_tpu.runtime import cached_jit

NBITS = 255


def window_size(n: int) -> int:
    """Bucket-width heuristic: balances N adds of accumulation vs 2^c-ish
    adds of bucket reduction per window."""
    lg = max(1, int(np.log2(max(n, 2))))
    return int(np.clip(lg - 3, 2, 14))


def num_windows(c: int) -> int:
    return (NBITS + c - 1) // c


def _digits(scalars, c: int):
    """Canonical Fr scalars (16, N) -> (W, N) uint32 window digits,
    most-significant window FIRST (scan runs high->low)."""
    s = FR.canon(scalars)
    W = num_windows(c)
    out = []
    for w in range(W):
        bit0 = w * c
        i0, o0 = bit0 // 15, bit0 % 15
        d = s[i0] >> np.uint32(o0)
        if o0 + c > 15 and i0 + 1 < L:
            d = d | (s[i0 + 1] << np.uint32(15 - o0))
        if o0 + c > 30 and i0 + 2 < L:
            d = d | (s[i0 + 2] << np.uint32(30 - o0))
        out.append(d & np.uint32((1 << c) - 1))
    out.reverse()
    return jnp.stack(out)


def _max_bucket_count(digits):
    """Max count of any (window, nonzero-digit) bucket, as a device scalar."""

    def body(carry, d):
        counts = jnp.zeros((1 << 16,), jnp.int32).at[d.astype(jnp.int32)].add(1)
        counts = counts.at[0].set(0)
        return jnp.maximum(carry, counts.max()), 0.0

    m, _ = jax.lax.scan(body, jnp.int32(0), digits)
    return m


def _pippenger(points: cv.PointVec, digits, c: int, pad: int) -> cv.PointVec:
    """Static-shape Pippenger given digits (W, N) and bucket padding."""
    W, N = digits.shape
    B = 1 << c
    ident = cv.identity((B * pad,))

    def window_body(acc, d):
        order = jnp.argsort(d)
        sd = d[order]
        pts = cv.gather_points(points, order)
        first = jnp.searchsorted(sd, sd, side="left")
        rank = jnp.arange(N, dtype=first.dtype) - first
        idx = sd.astype(jnp.int32) * pad + jnp.minimum(rank, pad - 1).astype(jnp.int32)
        M = cv.PointVec(
            ident.x.at[:, idx].set(pts.x),
            ident.y.at[:, idx].set(pts.y),
            ident.z.at[:, idx].set(pts.z),
        )
        M = cv.PointVec(*(a.reshape(L, B, pad) for a in M))
        S = cv.sum_points(M, axis=1)  # (16, B): bucket sums
        # suffix sums SS_b = sum_{j>=b} S_j; weighted sum = sum_{b>=1} SS_b
        T = S
        sh = 1
        while sh < B:
            shifted = cv.PointVec(
                *(jnp.concatenate([a[:, sh:], cv.identity((sh,))[i]], axis=1)
                  for i, a in enumerate(T))
            )
            T = cv.padd(T, shifted)
            sh *= 2
        wsum = cv.sum_points(cv.PointVec(*(a[:, 1:] for a in T)), axis=0)
        acc = jax.lax.fori_loop(0, c, lambda _, p: cv.pdbl(p), acc)
        return cv.padd(acc, wsum), 0.0

    acc, _ = jax.lax.scan(window_body, cv.identity(()), digits)
    return acc


def _bucket_sums_chunk(points: cv.PointVec, digits, c: int, pad: int):
    """Stage 1 (per chunk): bucket sums for a chunk of windows, with the
    window axis as a real vectorized array axis - NO loop.  (Wc, N) digits
    -> (Wc, L, B) sums.

    Loop-free on purpose: lax.scan with stacked (ys) outputs of this shape
    is one of the two miscompile triggers on the current TPU backend (see
    module docstring); a batched kernel sidesteps it and is also the better
    TPU program (one big scatter + one tree reduce instead of Wc small
    ones)."""
    Wc, N = digits.shape
    B = 1 << c
    order = jnp.argsort(digits, axis=1)
    sd = jnp.take_along_axis(digits, order, axis=1)
    pts = cv.PointVec(
        *(jnp.take(a, order, axis=1).reshape(L, Wc * N) for a in points)
    )  # a[:, order] -> (L, Wc, N)
    first = jax.vmap(lambda row: jnp.searchsorted(row, row, side="left"))(sd)
    rank = jnp.arange(N, dtype=first.dtype)[None, :] - first
    col = sd.astype(jnp.int32) * pad + jnp.minimum(rank, pad - 1).astype(jnp.int32)
    idx = (jnp.arange(Wc, dtype=jnp.int32)[:, None] * (B * pad) + col).reshape(Wc * N)
    ident = cv.identity((Wc * B * pad,))
    M = cv.PointVec(
        ident.x.at[:, idx].set(pts.x),
        ident.y.at[:, idx].set(pts.y),
        ident.z.at[:, idx].set(pts.z),
    )
    M = cv.PointVec(*(a.reshape(L, Wc, B, pad) for a in M))
    S = cv.sum_points(M, axis=2)  # (L, Wc, B)
    return tuple(jnp.moveaxis(a, 0, 1) for a in S)  # (Wc, L, B)


# scratch budget for the stage-1 scatter matrix, in point columns
# (chunk * B * pad).  The real memory unit is the padd tree-reduce's fused
# multiply temporaries - (18, 6, cols/2) uint32 stacks, ~216 bytes/column
# with up to ~20 live at once - so 2^18 columns keeps peak HBM ~1 GB.
_SCATTER_BUDGET_COLS = 1 << 18


def _bucket_sums(points: cv.PointVec, digits, c: int, pad: int):
    """Stage 1: per-window bucket sums, (W, N) digits -> (W, L, B), chunked
    over windows to bound the scatter scratch matrix."""
    W, N = digits.shape
    B = 1 << c
    chunk = max(1, min(W, _SCATTER_BUDGET_COLS // (B * pad)))
    outs = []
    k = cached_jit(_bucket_sums_chunk, "bsc", c, pad, chunk, static_argnums=(2, 3))
    for w0 in range(0, W - W % chunk, chunk):
        outs.append(k(points, digits[w0 : w0 + chunk], c, pad))
    if W % chunk:
        ktail = cached_jit(
            _bucket_sums_chunk, "bsc", c, pad, W % chunk, static_argnums=(2, 3)
        )
        outs.append(ktail(points, digits[W - W % chunk :], c, pad))
    if len(outs) == 1:
        return outs[0]
    return tuple(jnp.concatenate([o[i] for o in outs], axis=0) for i in range(3))


def _suffix_mask(xs, c: int):
    """Stage 2: bucket-weight application.  Suffix sums T_b = sum_{j>=b} S_j
    give sum_{b>=1} T_b = sum_b b*S_b; bucket 0 (the zero-digit dump) is
    masked to the identity.  (W, L, B) -> (W, L, B)."""
    B = 1 << c
    T = cv.PointVec(*(jnp.moveaxis(a, 0, 1) for a in xs))  # (L, W, B)
    Wn = T.x.shape[1]
    sh = 1
    while sh < B:
        shifted = cv.PointVec(
            *(jnp.concatenate([a[:, :, sh:], cv.identity((Wn, sh))[i]], axis=2)
              for i, a in enumerate(T))
        )
        T = cv.padd(T, shifted)
        sh *= 2
    T = cv.pselect(jnp.arange(B) >= 1, T, cv.identity((Wn, B)))
    return tuple(jnp.moveaxis(a, 1, 0) for a in T)  # (W, L, B)


def _horner_windows(xs, c: int):
    """Stage 3: Horner over windows at full lane width.  Carry a (L, B)
    point vector acc_{w+1} = 2^c * acc_w + T_w (doubling distributes over
    lanes, so the final per-lane sum equals the per-window weighted sum)."""
    B = xs[0].shape[2]

    def body(acc, t):
        acc = jax.lax.fori_loop(0, c, lambda _, p: cv.pdbl(p), acc)
        return cv.padd(acc, cv.PointVec(*t)), 0.0

    acc, _ = jax.lax.scan(body, cv.identity((B,)), xs)
    return tuple(acc)  # (L, B)


def _lane_reduce(xs):
    """Stage 4: tree-reduce the lane axis to one projective point."""
    return cv.sum_points(cv.PointVec(*xs), axis=0)


def msm(points: cv.PointVec, scalars, c: int | None = None) -> cv.PointVec:
    """MSM over the Pallas curve: sum_i scalars_i * points_i.

    points: PointVec with batch (N,); scalars: (16, N) Fr limbs.
    Host-orchestrated: digit extraction and bucket-size measurement run as
    small jitted kernels, then the four Pippenger stages are dispatched
    (staged, not fused - see module docstring).  Returns a single projective
    point (batch ()).
    """
    N = points.x.shape[1]
    assert scalars.shape == (L, N)
    if c is None:
        c = window_size(N)
    digits = cached_jit(_digits, c, static_argnums=1)(scalars, c)
    maxc = int(cached_jit(_max_bucket_count)(digits))
    pad = 1
    while pad < maxc:
        pad *= 2
    pad = min(pad, N)
    s = _bucket_sums(points, digits, c, pad)
    t = cached_jit(_suffix_mask, "sm", c, static_argnums=1)(s, c)
    a = cached_jit(_horner_windows, "hw", c, static_argnums=1)(t, c)
    return cached_jit(_lane_reduce, "lr")(a)


def msm_naive(points: cv.PointVec, scalars) -> cv.PointVec:
    """Reference binary-method MSM (255 doublings + masked adds + tree sum).
    O(255 N) adds - used as a slow independent check of the Pippenger path.
    """
    N = points.x.shape[1]
    s = FR.canon(scalars)

    def body2(i, acc):
        acc = cv.pdbl(acc)
        bit_idx = NBITS - 1 - i
        limb_i = bit_idx // 15
        off = (bit_idx % 15).astype(jnp.uint32)
        limb = s[limb_i]
        b = ((limb >> off) & 1).astype(jnp.bool_)
        sel = cv.pselect(b, points, cv.identity((N,)))
        return cv.padd(acc, cv.sum_points(sel, axis=0))

    return jax.lax.fori_loop(0, NBITS, body2, cv.identity(()))


def msm_rows(points: cv.PointVec, scalars) -> cv.PointVec:
    """Batched independent small MSMs: points batch (B, M), scalars
    (16, B, M) -> one point per row (batch (B,)).

    Used to verify many succinct checks at once: each row is one proof's
    deferred group equation (2 lg d + 4 points).  Binary double-and-add
    over the 255 shared bit positions with per-lane masks + a tree sum
    over M; the whole batch advances in lockstep on the VPU.
    """
    B, M = points.x.shape[1:]
    s = FR.canon(scalars)

    def body(i, acc):
        acc = cv.pdbl(acc)
        bit_idx = NBITS - 1 - i
        limb = s[bit_idx // 15]  # (B, M)
        b = ((limb >> (bit_idx % 15).astype(jnp.uint32)) & 1).astype(jnp.bool_)
        sel = cv.pselect(b, points, cv.identity((B, M)))
        return cv.padd(acc, cv.sum_points(sel, axis=1))

    return jax.lax.fori_loop(0, NBITS, body, cv.identity((B,)))
