"""Multi-scalar multiplication (Pippenger) as vectorized JAX kernels.

Replaces arkworks' VariableBaseMSM::msm_unchecked
(/root/reference/code/src/group.rs:18-26 -> pedersen.rs:14, pcdl.rs:204,208,
338, acc.rs:178) with a TPU-native formulation.  GPUs/CPUs bucket points
with scatter loops and per-thread serial accumulation; TPUs have neither
atomics nor per-lane control flow, so the bucket phase is restructured as
data movement XLA is actually good at.  The hot path is the SORT-PAYLOAD
pipeline ("sortrows", default since round 5):

  pair-packed coordinate planes ride the digit sort as lax.sort payload ->
  bucket boundaries by searchsorted -> 8-row-aligned BLOCK gathers expand
  buckets (8x fewer indexes; gathers are index-rate-bound at ~60 ns/index
  while sorts move payload nearly free - tools/tpu_gather_probe.py,
  tpu_sortmove_probe.py) -> IN-KERNEL pad-axis reduction with per-column
  (off, len) masking of ragged bucket edges (pallas_kernels.
  bucket_accum_masked) -> suffix-doubling weighted sum -> Horner.

Key properties:

  * Zero digits are routed to bucket 0, which carries weight 0 and is
    never gathered: a "dump" bucket.  MSM cost scales with the number of
    *nonzero* digits - commitments to low-degree polynomials padded with
    zeros (pcdl.rs:99-110 pads to n = d+1) cost almost nothing.
  * PAD (max points per bucket) is PINNED to a deterministic per-size-class
    value with a deferred device validity flag (no measurement sync; the
    astronomically-rare overflow falls back to a measured re-run).  Windows
    are grouped into runs sharing (bucket count, pad); the top window -
    whose digit range is cut by the field modulus - gets its own group.
    Sort operand count and window-group width are the compile-time levers
    (see planes_from_affine and _SORT_BUDGET_COLS).
  * DUAL-OUTPUT mode (nroute=2): two disjoint-support scalar vectors (the
    IPA open round's L and R) share one sort per window by doubling the
    bucket space with a route bit.  MANY mode (msm_many_flagged): K MSMs
    over one basis stack as K*W window rows (fused deciders).
  * fold_basis: shared-scalar Strauss collapse of a packed basis by 16 -
    the prover's 4-rounds-at-once generator fold.
  * HALO_TPU_MSM_IMPL=rowperm selects the round-3/4 inverse-permutation
    row-gather pipeline; =staged the measured-pad scatter pipeline
    (_bucket_sums -> _weight_and_combine) - the correctness backstops
    (bench.py cross-checks pipelines on device every run) and the building
    block of the sharded MSM.  Staged's point-chunked fallback bounds
    memory under any digit skew.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from halo_accumulation_tpu import fields as _fields
from halo_accumulation_tpu.ops import curve as cv
from halo_accumulation_tpu.ops.field import FR, L
from halo_accumulation_tpu.runtime import cached_jit

NBITS = 255

# scratch budget for the stage-1 scatter matrix, in point columns
# (window_group * B * pad).  A column is ~216 bytes of limb planes plus the
# pad tree-reduce's temporaries; 2^21 columns keeps peak HBM use around
# 1-1.5 GB, comfortable on a 16 GB chip and irrelevant on CPU test meshes.
_SCATTER_BUDGET_COLS = int(os.environ.get("HALO_TPU_MSM_BUDGET_COLS", str(1 << 21)))

# the SORTROWS pipeline gets a larger budget: its per-group cost that
# matters is the SORT COMPILE (one ~90 s Mosaic/XLA sort per window
# group on this toolchain), so groups must stay wide - at N=2^20 a 2^21
# budget forced Wg=1, i.e. 22 separate sorts and a >30 min MSM compile.
# 2^24 columns peaks ~2.5 GB of transient gather matrix on a 16 GB chip
# and compiles ~3 sorts instead.
_SORT_BUDGET_COLS = int(os.environ.get("HALO_TPU_MSM_SORT_BUDGET_COLS", str(1 << 24)))


def window_size(n: int) -> int:
    """Bucket-width heuristic.  Balances stage-1 scatter cost
    W*B*pad ~ W*N*(pad/mean) against the suffix scan's W*B*c and the
    per-window sort/gather overhead."""
    if n >= (1 << 18):
        # 12, not 13: (c + lg N) <= 32 keeps the perm build on the packed
        # single-operand sort at N = 2^20 (the sort dominates large-N MSM
        # wall clock), and the smaller bucket space more than pays for the
        # extra two windows (22*4096*384 < 20*8192*256 scatter columns).
        return 12
    if n >= (1 << 15):
        return 10
    if n >= (1 << 11):
        return 8
    if n >= (1 << 8):
        return 6
    return 4


def num_windows(c: int) -> int:
    return (NBITS + c - 1) // c


def _round_pad(m: int) -> int:
    """Round a bucket count up to the next size class: {2^k, 3*2^(k-1)}
    below 2048 (bounds jit-cache growth, <= 33% overhead), multiples of
    1024 above (the top window's pad at large N is thousands - 33% there
    would waste megabytes of scatter columns per window)."""
    if m <= 2:
        return max(1, m)
    if m > 2048:
        return ((m + 1023) // 1024) * 1024
    p = 1
    while True:
        if p >= m:
            return p
        if 3 * p // 2 >= m and p >= 2:
            return 3 * p // 2
        p *= 2


def _beffs(c: int) -> list[int]:
    """Effective bucket-space size per window (msb first).  The top window's
    digits are bounded by the scalar field modulus (canonical Fr < r), so
    its bucket space is a fraction of 2^c."""
    W = num_windows(c)
    top_bound = ((_fields.R - 1) >> ((W - 1) * c)) + 1
    top = 1
    while top < top_bound:
        top *= 2
    return [min(top, 1 << c)] + [1 << c] * (W - 1)


def _digits(scalars, c: int):
    """Canonical Fr scalars (L, N) -> (W, N) uint32 window digits,
    most-significant window FIRST (the combine scans high->low)."""
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


def _max_bucket_counts(digits, c: int):
    """Per-row max count of any nonzero-digit bucket: (R, N) -> (R,) int32.
    Rows are windows (or window x point-chunk pairs when re-measuring for
    a chunked dispatch)."""
    B = 1 << c

    def body(carry, d):
        counts = jnp.zeros((B,), jnp.int32).at[d.astype(jnp.int32)].add(1)
        counts = counts.at[0].set(0)
        return carry, counts.max()

    _, ms = jax.lax.scan(body, 0, digits)
    return ms


# ---------------------------------------------------------------------------
# Row-permutation Pippenger (the TPU default since round 3).
#
# Round-2 profiling (tools/tpu_stage_probe.py at N=2^14) showed the staged
# pipeline spends >90% of its wall clock in XLA data movement around the
# point math: scattering 54 limb planes lane-by-lane cost 290 ms and the
# misaligned (., B, pad) tree layout another 133 ms, against ~10 ms of
# actual point adds at the measured Pallas rate.  The fix is to move POINTS
# AS 256-BYTE ROWS and keep every compute array lane-aligned:
#
#   1. digits -> per-window sort ranks (u32-only math),
#   2. build an int32 INVERSE permutation: scatter each point's index (4
#      bytes, not 216) into its (window, bucket, slot) cell; empty cells
#      keep the sentinel N,
#   3. ONE row gather pulls the whole scatter matrix: points live as
#      (N+1, 64) u32 rows (54 coordinate limbs + pad; row N = identity),
#      so the gather moves contiguous 256 B rows - DMA-friendly,
#   4. transpose once to limb planes laid out (L, pad, W*B): the pad tree
#      reduce slices the MIDDLE axis so every operand keeps a 128-multiple
#      lane dimension, feeding the fused Pallas padd at full rate,
#   5. suffix-scan bucket weighting + Horner window combine as before.
#
# Pads are PINNED (deterministic per size class) with a deferred device
# validity flag - no measurement sync - and window groups sharing
# (bucket-space, pad) run as one call, combined with shift-adds.


def rows_from_points(points: cv.PointVec):
    """PointVec (L, N) planes -> (N+1, 64) u32 rows: row n = x limbs ||
    y limbs || z limbs || zero pad; row N is the identity (0:1:0)."""
    N = points.x.shape[1]
    arr = jnp.concatenate([points.x, points.y, points.z], axis=0)  # (3L, N)
    arr = jnp.pad(arr, ((0, 64 - 3 * L), (0, 0)))
    ident = jnp.zeros((1, 64), jnp.uint32).at[0, L].set(1)  # y = 1
    return jnp.concatenate([arr.T, ident], axis=0)


def rows_from_affine(xs, ys):
    """Affine x/y limb planes (L, N) -> (N+1, 40) u32 rows
    (x || y || z-indicator || pad).  Lane 2L carries Z's low limb directly
    (1 for real points, 0 for the sentinel): full Z is NOT stored, saving
    37.5% of the gather/transpose bytes on the big fixed-base MSMs
    (commit / decider, whose URS points are affine).  Row N is the
    placeholder for empty slots; with Z=0 and y_0=1 it decodes as the
    identity (0:1:0) (a (0,0,0) triple is NOT the identity under the
    complete formulas - it absorbs everything it touches)."""
    N = xs.shape[1]
    arr = jnp.concatenate(
        [xs, ys, jnp.ones((1, N), jnp.uint32), jnp.zeros((40 - 2 * L - 1, N), jnp.uint32)],
        axis=0,
    )
    ident = jnp.zeros((1, 40), jnp.uint32).at[0, L].set(1)
    return jnp.concatenate([arr.T, ident], axis=0)


def _rows_cached(points: cv.PointVec):
    N = points.x.shape[1]
    return cached_jit(rows_from_points, "rows", N)(points)


def _perm_slots(digits_g, pad: int, beff: int):
    """Inverse permutation for one window group: digits_g (Wg, N) ->
    (src (pad, Wg*beff) int32 with sentinel N for empty slots, ok bool).

    GATHER-ONLY construction (no XLA scatter, no per-element searchsorted -
    both measured 20-40x slower than this on TPU): argsort the digits, then
    binary-search only the B bucket boundaries in each sorted row; slot
    (p, w, b) reads sorted position first[w, b] + p when p < count[w, b].

    ok is False iff some NONZERO-digit bucket overflows pad (zero digits
    may overflow freely: bucket 0 is the dump bucket, masked out of the
    weighted sum)."""
    Wg, N = digits_g.shape
    ibits = max(1, (N - 1).bit_length())
    if beff << ibits <= 1 << 32:
        # PACKED single-operand sort: key = (digit << ibits) | index.  One
        # u32 sort moves half the bytes of the (key, value) argsort pair
        # and skips the take_along_axis re-gather; packing preserves
        # digit-major order, so bucket boundaries come from searchsorted on
        # the packed keys directly.  The sort is the dominant non-point
        # cost of the whole MSM at large N.
        iota = jnp.arange(N, dtype=jnp.uint32)[None]
        key = (digits_g.astype(jnp.uint32) << np.uint32(ibits)) | iota
        skey = jnp.sort(key, axis=1)
        bvals = (jnp.arange(beff, dtype=jnp.uint32) << np.uint32(ibits))
        first = jax.vmap(lambda row: jnp.searchsorted(row, bvals, side="left"))(skey)
        # End-of-bucket boundary via side="right" on (b << ibits) | max_index:
        # overflow-free even at beff << ibits == 2^32, where the former
        # bvals + (1 << ibits) wrapped to 0 for the top bucket and silently
        # dropped its points (ADVICE r4 high: the c=12 N=2^20 design point).
        nxt = jax.vmap(
            lambda row: jnp.searchsorted(
                row, bvals | jnp.uint32((1 << ibits) - 1), side="right"
            )
        )(skey)
        order = (skey & jnp.uint32((1 << ibits) - 1)).astype(jnp.int32)
    else:
        order = jnp.argsort(digits_g, axis=1).astype(jnp.int32)
        sd = jnp.take_along_axis(digits_g, order.astype(jnp.uint32), axis=1)
        bvals = jnp.arange(beff, dtype=sd.dtype)
        first = jax.vmap(lambda row: jnp.searchsorted(row, bvals, side="left"))(sd)
        nxt = jax.vmap(lambda row: jnp.searchsorted(row, bvals, side="right"))(sd)
    count = (nxt - first).astype(jnp.int32)  # (Wg, beff)
    ok = jnp.max(count[:, 1:]) <= pad
    p = jnp.arange(pad, dtype=jnp.int32)[:, None, None]  # (pad, 1, 1)
    idx = first.astype(jnp.int32)[None] + p  # (pad, Wg, beff)
    valid = p < count[None]
    got = jnp.take_along_axis(
        order,
        jnp.moveaxis(jnp.minimum(idx, N - 1), 0, 1).reshape(Wg, pad * beff),
        axis=1,
    ).reshape(Wg, pad, beff)
    src = jnp.where(jnp.moveaxis(valid, 0, 1), got, N)  # (Wg, pad, beff)
    return jnp.moveaxis(src, 1, 0).reshape(pad, Wg * beff), ok


def _bucket_cols() -> int:
    """Column granularity of the Pallas bucket kernel (br * 128 lanes)."""
    from halo_accumulation_tpu.ops import pallas_kernels as pk

    return pk._block_rows() * 128


def _bucket_group_rows(rows, src, pad: int, Wg: int, beff: int) -> cv.PointVec:
    """One window group's per-window weighted bucket sums (L, Wg) from the
    row table + inverse permutation: gather -> transpose -> in-kernel pad
    reduction -> suffix-doubling weighting.  The cross-window Horner runs
    ONCE over all groups' outputs in _rowperm_msm (a per-group Horner +
    single-point shift_add chain doubled the sequential tail that
    dominates small-N latency).

    rows may be full (N+1, 64) projective rows or (N+1, 40) affine rows
    (rows_from_affine, whose lane 2L carries Z's low limb: 1 for real
    points, 0 for the identity sentinel that fills empty slots).
    src: (pad, Wg*beff) int32 inverse permutation from _perm_slots.

    Every stage is O(1) in HLO size: the pad reduction is ONE Pallas
    kernel revisiting its output block across a sequential grid axis
    (pallas_kernels.bucket_accum), and the bucket weighting runs as
    fori_loops over a single fixed padd shape.  (Round 3 unrolled a
    7-level pad tree + suffix scan into one giant XLA graph; the remote
    compile service cannot even finish such graphs - BENCH_r03.)"""
    cols = Wg * beff
    lanes = rows.shape[1]
    nsent = rows.shape[0] - 1
    from halo_accumulation_tpu.ops import pallas_kernels as pk

    # The in-kernel reduction currently runs only for the affine (40-lane)
    # row form: every production fixed-base MSM (commit/decider, the
    # headline paths) uses it via pp.gs_rows.  The projective (64-lane)
    # variant compiles but is quarantined until its Mosaic compile time is
    # validated on hardware (a mid-compile kill wedges the remote compile
    # service for ~40 min - see tools/tpu_kernel_ladder.py); projective
    # inputs take the sequential-fori fallback below, which reuses the
    # fixed-shape Pallas padd.
    use_kernel = pk.enabled() and jax.default_backend() == "tpu" and lanes == 40
    g = _bucket_cols() if use_kernel else 1024
    # K-way pad folding: when the group has fewer columns than one kernel
    # block (g lanes), slot (p, col) is re-laid-out to
    # (p // K, col * K + p % K) so the otherwise-idle lanes absorb K slices
    # of the pad axis and the sequential reduction shrinks K-fold (the
    # c=12 top window at N=2^20 has 8 columns x ~150k pad - unfolded, the
    # reduction would run 150k near-empty steps).  The K partials per
    # column are tree-combined by _strided_sum.  The XLA fallback shares
    # the same relayout (same win for its sequential fori).
    K = 1
    while cols * K * 2 <= g and K * 2 <= pad:
        K *= 2
    padq = (pad + K - 1) // K
    if padq * K > pad:
        src = jnp.pad(src, ((0, padq * K - pad), (0, 0)), constant_values=nsent)
    if K > 1:
        src = jnp.moveaxis(src.reshape(padq, K, cols), 1, 2).reshape(padq, cols * K)
    colsK = cols * K
    if use_kernel:
        colsP = ((colsK + g - 1) // g) * g
        if colsP > colsK:
            src = jnp.pad(src, ((0, 0), (0, colsP - colsK)), constant_values=nsent)
        M = jnp.take(rows, src.reshape(padq * colsP), axis=0)  # (padq*colsP, lanes)
        Mt = M.T.reshape(lanes, padq, colsP)
        ox, oy, oz = pk.bucket_accum(Mt)
        S = cv.PointVec(*(o[:, :colsK].reshape(L, cols, K) for o in (ox, oy, oz)))
    else:
        M = jnp.take(rows, src.reshape(padq * colsK), axis=0)
        Mt = M.T.reshape(lanes, padq, colsK)

        def slot(p):
            sl = jax.lax.dynamic_slice_in_dim(Mt, p, 1, axis=1)[:, 0]  # (lanes, colsK)
            if lanes == 40:
                Z = jnp.concatenate(
                    [sl[2 * L : 2 * L + 1], jnp.zeros((L - 1, colsK), jnp.uint32)], axis=0
                )
                return cv.PointVec(sl[0:L], sl[L : 2 * L], Z)
            return cv.PointVec(sl[0:L], sl[L : 2 * L], sl[2 * L : 3 * L])

        # sequential fori over the folded pad axis: one compiled padd shape
        # (mirrors the in-kernel reduction; HLO stays O(1) in pad)
        S = jax.lax.fori_loop(
            1, padq, lambda p, acc: cv.padd(acc, slot(p)), slot(0)
        )
        S = cv.PointVec(*(a.reshape(L, cols, K) for a in S))
    if K > 1:
        S = _strided_sum(S, K)
    else:
        S = cv.PointVec(S.x[:, :, 0], S.y[:, :, 0], S.z[:, :, 0])
    S = cv.PointVec(*(a.reshape(L, Wg, beff) for a in S))
    return _suffix_weight(S, beff)  # (L, Wg)


def _shift_body(ident: cv.PointVec, n: int):
    """fori body T -> T + (T shifted left by 2^i along the last axis,
    identity-filled): the shared building block of suffix sums and strided
    reductions, at ONE fixed padd shape."""

    def body(i, T):
        sh = jnp.int32(1) << i
        shifted = cv.PointVec(
            *(
                jax.lax.dynamic_slice_in_dim(
                    jnp.concatenate([a, ia], axis=2), sh, n, axis=2
                )
                for a, ia in zip(T, ident)
            )
        )
        return cv.padd(T, shifted)

    return body


def _strided_sum(T: cv.PointVec, K: int) -> cv.PointVec:
    """Sum the last axis (size K, a power of two) with complete adds:
    log2(K) shift-add steps; position 0 accumulates the total."""
    ident = cv.identity(T.x.shape[1:])
    T = jax.lax.fori_loop(0, K.bit_length() - 1, _shift_body(ident, K), T)
    return cv.PointVec(T.x[:, :, 0], T.y[:, :, 0], T.z[:, :, 0])


def _suffix_weight(S: cv.PointVec, beff: int) -> cv.PointVec:
    """Weighted bucket sum sum_{b>=1} b * S_b per window: (L, Wg, beff) ->
    (L, Wg).

    Two suffix-doubling passes at ONE fixed shape (a fori_loop whose body
    adds a dynamically-shifted copy, identity-filled via concat+slice):
    pass 1 turns S into suffix sums SS_b = sum_{j>=b} S_j; masking bucket 0
    and running the same pass again leaves sum_{b>=1} SS_b = sum b*S_b at
    position 0.  2*lg(beff) point adds per lane, one compiled padd shape."""
    Wg = S.x.shape[1]
    if beff == 1:
        # only the dump bucket: weighted sum is the identity
        return cv.identity((Wg,))
    ident = cv.identity((Wg, beff))
    lgB = beff.bit_length() - 1
    body = _shift_body(ident, beff)
    T = jax.lax.fori_loop(0, lgB, body, S)
    T = cv.pselect(jnp.arange(beff) >= 1, T, ident)
    T = jax.lax.fori_loop(0, lgB, body, T)
    return cv.PointVec(T.x[:, :, 0], T.y[:, :, 0], T.z[:, :, 0])


def _expand_groups(pads: list[int], beffs: list[int]):
    """(pad, beff) runs sub-chunked so each call's scatter matrix fits the
    memory budget (in 256-byte row columns)."""
    out = []
    for w0, w1, beff, pad in _group_windows(pads, beffs):
        wc = max(1, _SCATTER_BUDGET_COLS // (beff * pad))
        for ws in range(w0, w1, wc):
            out.append((ws, min(ws + wc, w1), beff, pad))
    return out


def _rowperm_msm(
    points: cv.PointVec, scalars, c: int, pads: list[int], beffs: list[int], rows=None
):
    """Row-permutation MSM: returns (point, ok_device).  No host sync.
    rows: optional precomputed row table (full or affine form) - the URS
    paths pass PublicParams.gs_rows to skip the per-call transpose."""
    if rows is None:
        rows = _rows_cached(points)
    digits = cached_jit(_digits, c, static_argnums=1)(scalars, c)
    Vs = []
    oks = []
    for w0, w1, beff, pad in _expand_groups(pads, beffs):
        Wg = w1 - w0
        src, okv = cached_jit(_perm_slots, "ps", pad, beff, static_argnums=(1, 2))(
            digits[w0:w1], pad, beff
        )
        part = cached_jit(
            _bucket_group_rows, "bg", pad, Wg, beff, static_argnums=(2, 3, 4)
        )(rows, src, pad, Wg, beff)
        oks.append(okv)
        Vs.append(part)
    # groups are consecutive msb-first window runs: concat + ONE Horner
    if len(Vs) == 1:
        V = Vs[0]
    else:
        V = cv.PointVec(*(jnp.concatenate([v[i] for v in Vs], axis=1) for i in range(3)))
    acc = cached_jit(_horner_combine, "hc", c, V.x.shape[1], static_argnums=1)(tuple(V), c)
    ok = cached_jit(_all_true, "ok", len(oks), static_argnums=())(jnp.stack(oks))
    return acc, ok


def _all_true(flags):
    return jnp.all(flags)


def _group_windows(pads: list[int], beffs: list[int]):
    """Runs of consecutive windows sharing (beff, pad) -> [(w0, w1, beff, pad)]."""
    groups = []
    w0 = 0
    for w in range(1, len(pads) + 1):
        if w == len(pads) or (pads[w], beffs[w]) != (pads[w0], beffs[w0]):
            groups.append((w0, w, beffs[w0], pads[w0]))
            w0 = w
    return groups


# ---------------------------------------------------------------------------
# Sort-payload Pippenger ("sortrows", the default since round 5).
#
# Round-4 probes (tools/tpu_sortmove_probe.py, tools/tpu_gather_probe.py)
# established two facts that invalidate the rowperm pipeline's cost model:
#   * EVERY dynamic gather is INDEX-RATE bound at ~60 ns/index, regardless
#     of row width or locality - the per-slot (pad x buckets) row gather was
#     the dominant MSM cost at every size (77 of 86 ms at N=2^14), and
#   * lax.sort moves a 40-operand point payload essentially FOR FREE
#     (31 ms with payload vs 30 ms key-only at N=2^20).
# So this pipeline sorts the point COORDINATE PLANES along with the digit
# key (no index packing, no inverse permutation, no sentinel rows), then
# expands buckets with 8-ROW-ALIGNED BLOCK gathers - 8x fewer indexes - and
# masks the ragged bucket edges INSIDE the reduction kernel using a
# per-column (off, len) word (pallas_kernels.bucket_accum_masked).
#
# It also supports DUAL-OUTPUT MSMs (nroute=2): two scalar vectors with
# disjoint support (the IPA open round's L and R, pcdl.rs:203-209) share
# one sort per window by doubling the bucket space with a route bit; the
# suffix weighting and Horner then produce both points from one pass.


def planes_from_points(points: cv.PointVec):
    """PointVec -> (3L, N) u32 coordinate planes (sort operands).
    Projective/lazy form: NOT pair-packed (lazy limbs exceed 15 bits)."""
    return jnp.concatenate([points.x, points.y, points.z], axis=0)


def planes_from_affine(xs, ys):
    """CANONICAL affine limb planes -> (L, N) u32 PAIR-PACKED payload:
    plane k holds limbs 2k | 2k+1 << 15 of (x||y).  Canonical limbs are
    15-bit, so two fit one u32 - and sort compile time scales brutally with
    operand count (measured on the TPU toolchain at (25, 2^14): 9 operands
    24 s, 19 operands 85 s, 37 operands 360 s), so the packed form is what
    every fixed-base path sorts.  Z == 1 is synthesized from the
    slot-validity mask inside the masked reduction."""
    flat = jnp.concatenate([xs, ys], axis=0)  # (2L, N)
    return flat[0::2] | (flat[1::2] << jnp.uint32(15))


def _sorted_group(planes, digits_g, pad: int, beff: int, nroute: int):
    """One window group's weighted per-(window, route) sums from a payload
    sort: returns (PointVec (L, Wg, nroute), ok_device).

    digits_g: (Wg, N) u32 in [0, nroute*beff); N must be a multiple of 8."""
    Wg, N = digits_g.shape
    P = planes.shape[0]
    btot = nroute * beff
    ops = (digits_g,) + tuple(
        jnp.broadcast_to(planes[i][None], (Wg, N)) for i in range(P)
    )
    srt = jax.lax.sort(ops, dimension=1, is_stable=False, num_keys=1)
    # Fence the sort off from the downstream gather: XLA's attempt to fuse
    # the 37-operand sort into the block-gather's operand tree sent compile
    # time from ~40 s to >25 MINUTES at N=2^14 (bisect: sort alone 5 s,
    # gather alone 31 s, composed >580 s).
    srt = jax.lax.optimization_barrier(srt)
    skey = srt[0]
    splanes = jnp.stack(srt[1:], axis=0)  # (P, Wg, N) in digit order
    bvals = jnp.arange(btot, dtype=jnp.uint32)
    first = jax.vmap(lambda row: jnp.searchsorted(row, bvals, side="left"))(skey)
    nxt = jax.vmap(lambda row: jnp.searchsorted(row, bvals, side="right"))(skey)
    count = (nxt - first).astype(jnp.int32)  # (Wg, btot)
    # digit 0 of each route half is the zero-scalar dump bucket: weight 0,
    # never gathered (len = 0), free to overflow
    dump = (jnp.arange(btot, dtype=jnp.int32) % beff) == 0
    count = jnp.where(dump[None], 0, count)
    ok = jnp.max(count) <= pad
    count = jnp.minimum(count, pad)
    firsti = first.astype(jnp.int32)
    a = firsti & ~7  # block-aligned bucket start
    off = firsti - a  # 0..7
    pad8 = (pad + 7) // 8 + 1  # blocks cover off + count <= 7 + pad
    blk = a[None] // 8 + jnp.arange(pad8, dtype=jnp.int32)[:, None, None]
    gidx = (blk + (jnp.arange(Wg, dtype=jnp.int32) * (N // 8))[None, :, None]).reshape(-1)
    blocks = jnp.take(
        splanes.reshape(P, Wg * (N // 8), 8), gidx, axis=1, mode="clip"
    )  # (P, pad8*Wg*btot, 8); OOB/foreign-bucket rows are masked via meta
    M = blocks.reshape(P, pad8, Wg, btot, 8)
    M = jnp.moveaxis(M, 4, 2).reshape(P, pad8 * 8, Wg * btot)
    meta = (off.astype(jnp.uint32) | (count.astype(jnp.uint32) << 3)).reshape(
        1, Wg * btot
    )
    S = _masked_reduce(M, meta)  # (L, Wg*btot) bucket sums
    S = cv.PointVec(*(x.reshape(L, Wg * nroute, beff) for x in S))
    V = _suffix_weight(S, beff)  # (L, Wg*nroute)
    return cv.PointVec(*(x.reshape(L, Wg, nroute) for x in V)), ok


def unpack_affine_planes(packed):
    """Inverse of planes_from_affine: (L, ...) packed pairs -> (x, y) limb
    arrays of shape (L, ...)."""
    flat = jnp.stack(
        [
            (packed[k // 2] >> jnp.uint32(15 * (k % 2))) & jnp.uint32(0x7FFF)
            for k in range(2 * L)
        ]
    )
    return flat[:L], flat[L:]


def _masked_reduce(M, meta) -> cv.PointVec:
    """Reduce the pad axis of (P, pad', cols) sorted point data with
    complete adds, per-column (off, len) masking dead slots to the
    identity.  P == L: pair-packed affine (planes_from_affine); P == 3L:
    projective.  Pallas kernel on TPU; sequential fori elsewhere."""
    from halo_accumulation_tpu.ops import pallas_kernels as pk

    P, padp, cols = M.shape
    if pk.enabled() and jax.default_backend() == "tpu":
        g = _bucket_cols()
        colsP = ((cols + g - 1) // g) * g
        if colsP > cols:
            M = jnp.pad(M, ((0, 0), (0, 0), (0, colsP - cols)))
            meta = jnp.pad(meta, ((0, 0), (0, colsP - cols)))
        ox, oy, oz = pk.bucket_accum_masked(M, meta)
        return cv.PointVec(ox[:, :cols], oy[:, :cols], oz[:, :cols])
    aff = P == L
    offv = meta[0] & jnp.uint32(7)
    lnv = meta[0] >> jnp.uint32(3)

    def body(p, acc):
        sl = jax.lax.dynamic_slice_in_dim(M, p, 1, axis=1)[:, 0]  # (P, cols)
        pv = p.astype(jnp.uint32)
        cond = (pv >= offv) & (pv < offv + lnv)
        one = jnp.ones((cols,), jnp.uint32)
        if aff:
            xs, ys = unpack_affine_planes(sl)
        else:
            xs, ys = sl[0:L], sl[L : 2 * L]
        x = jnp.where(cond[None], xs, jnp.uint32(0))
        y = jnp.concatenate(
            [
                jnp.where(cond, ys[0], one)[None],
                jnp.where(cond[None], ys[1:], jnp.uint32(0)),
            ]
        )
        if aff:
            z = jnp.concatenate(
                [jnp.where(cond, one, jnp.uint32(0))[None], jnp.zeros((L - 1, cols), jnp.uint32)]
            )
        else:
            z = jnp.where(cond[None], sl[2 * L : 3 * L], jnp.uint32(0))
        return cv.padd(acc, cv.PointVec(x, y, z))

    return jax.lax.fori_loop(0, padp, body, cv.identity((cols,)))


def _horner_routes(xs, c: int):
    """Horner window combine over (L, W, R) per-window points (msb window
    first), batched over the route axis: (L, R) result."""
    seq = tuple(jnp.moveaxis(a, 1, 0) for a in xs)  # (W, L, R)
    R = xs[0].shape[2]

    def body(acc, t):
        acc = jax.lax.fori_loop(0, c, lambda _, p: cv.pdbl(p), acc)
        return cv.padd(acc, cv.PointVec(*t)), 0.0

    acc, _ = jax.lax.scan(body, cv.identity((R,)), seq)
    return acc


def _sortrows_msm(
    planes, scalars, c: int, pads: list[int], beffs: list[int], route=None, nroute: int = 1
):
    """Sort-payload MSM: returns ([point] * nroute, ok_device), no host
    sync.  planes: (2L, N) affine or (3L, N) projective coordinate planes;
    route: optional (N,) int32 in [0, nroute) choosing each point's output
    (supports must be disjoint in the scalar sense: a point contributes to
    exactly one output)."""
    digits = cached_jit(_digits, c, static_argnums=1)(scalars, c)
    Vs, oks = [], []
    for w0, w1, beff, pad in _expand_groups_sorted(pads, beffs, nroute):
        dg = digits[w0:w1]
        if route is not None:
            dg = cached_jit(_route_digits, "rd", beff)(dg, route, beff)
        V, okv = cached_jit(
            _sorted_group, "sg", pad, beff, nroute, static_argnums=(2, 3, 4)
        )(planes, dg, pad, beff, nroute)
        Vs.append(V)
        oks.append(okv)
    if len(Vs) == 1:
        V = Vs[0]
    else:
        V = cv.PointVec(*(jnp.concatenate([v[i] for v in Vs], axis=1) for i in range(3)))
    acc = cached_jit(_horner_routes, "hr", c, V.x.shape[1], nroute, static_argnums=1)(
        tuple(V), c
    )
    outs = [cv.PointVec(acc.x[:, r], acc.y[:, r], acc.z[:, r]) for r in range(nroute)]
    ok = cached_jit(_all_true, "okS", len(oks), static_argnums=())(jnp.stack(oks))
    return outs, ok


def _route_digits(dg, route, beff):
    return dg + route[None].astype(jnp.uint32) * jnp.uint32(beff)


def _sortrows_one(planes, scalars, c: int, pads: tuple, beffs: tuple):
    """jit-wrapper body for a single-output sortrows MSM (one dispatch)."""
    return _sortrows_msm(planes, scalars, c, list(pads), list(beffs))


def fold_basis(planes, t16):
    """Collapse a pair-packed affine basis by 16: with w2 = W/16,

        B'[j] = sum_{h=0}^{15} t16[:, h] * B[h*w2 + j],   j < w2

    (the IPA open's generator fold for FOUR rounds at once: t16 are the
    tensor coefficients of the segment's challenges, SHARED across j -
    pcdl.rs:216-224 done lazily so rounds 4+ run at 1/16 width).

    Shared-scalar Strauss: 4-bit windows over all 16 scalars together -
    per window 4 doublings + a 16-way table-select tree, ~90*W point-ops
    total.  Columns are chunked to bound the 16x16-multiples table memory.
    Returns (planes' (L, w2) packed affine, any_inf) - any_inf True iff a
    collapsed combination hit the identity (cryptographically negligible;
    the caller falls back to the measured host path)."""
    W_ = planes.shape[1]
    w2 = W_ // 16
    xs, ys = unpack_affine_planes(planes)  # (2L,) split of (L, W)
    xs = xs.reshape(L, 16, w2)
    ys = ys.reshape(L, 16, w2)
    digits = _digits(t16, 4)  # (64, 16) msb-first windows
    CH = min(w2, 4096)
    nch = w2 // CH

    from halo_accumulation_tpu.ops.field import FQ

    def chunk(ci, out):
        sx = jax.lax.dynamic_slice_in_dim(xs, ci * CH, CH, axis=2)
        sy = jax.lax.dynamic_slice_in_dim(ys, ci * CH, CH, axis=2)
        P = cv.PointVec(sx, sy, FQ.from_int(1, (16, CH)))
        tab = [cv.identity((16, CH)), P]
        for _ in range(14):
            tab.append(cv.padd(tab[-1], P))
        T = cv.PointVec(
            jnp.stack([t.x for t in tab]),
            jnp.stack([t.y for t in tab]),
            jnp.stack([t.z for t in tab]),
        )  # (16, L, 16, CH)

        def win(k, acc):
            acc = cv.pdbl(cv.pdbl(cv.pdbl(cv.pdbl(acc))))
            dk = jax.lax.dynamic_index_in_dim(digits, k, 0, keepdims=False)  # (16,)
            idx = dk[None, None, :, None].astype(jnp.int32)
            sel = cv.PointVec(
                jnp.take_along_axis(T.x, idx, axis=0)[0],
                jnp.take_along_axis(T.y, idx, axis=0)[0],
                jnp.take_along_axis(T.z, idx, axis=0)[0],
            )  # (L, 16, CH)
            return cv.padd(acc, cv.sum_points(sel, axis=0))

        accp = jax.lax.fori_loop(0, 64, win, cv.identity((CH,)))
        return tuple(
            jax.lax.dynamic_update_slice_in_dim(o, a, ci * CH, axis=1)
            for o, a in zip(out, accp)
        )

    out0 = tuple(jnp.zeros((L, w2), jnp.uint32) for _ in range(3))
    ox, oy, oz = jax.lax.fori_loop(0, nch, chunk, out0)
    ax, ay, inf = cv.to_affine(cv.PointVec(ox, oy, oz))
    return planes_from_affine(ax, ay), jnp.any(inf)


def msm_many_flagged(planes, scalars_many, c: int, pads: list[int], beffs: list[int]):
    """K independent MSMs over ONE fixed basis, trace-safe (no host sync):
    scalars_many (K, L, N) -> (PointVec (L, K), ok_device).

    The K scalar vectors' window digits stack as K*W rows through the same
    sort/gather/reduce machinery (each row sorts independently), and the
    Horner window combine runs batched over K - so K deciders' deferred
    n-MSMs (acc.rs:245-255 per chain step, the reference's "slow path")
    cost one fused dispatch instead of K."""
    K = scalars_many.shape[0]
    digits = jax.vmap(lambda s: _digits(s, c))(scalars_many)  # (K, W, N)
    W = digits.shape[1]
    digits = digits.reshape(K * W, digits.shape[2])
    Vs, oks = [], []
    for w0, w1, beff, pad in _expand_groups_sorted(pads * K, beffs * K, 1):
        V, okv = _sorted_group(planes, digits[w0:w1], pad, beff, 1)
        Vs.append(V)
        oks.append(okv)
    if len(Vs) == 1:
        V = Vs[0]
    else:
        V = cv.PointVec(*(jnp.concatenate([v[i] for v in Vs], axis=1) for i in range(3)))
    V = cv.PointVec(*(x.reshape(L, K, W).transpose(0, 2, 1) for x in V))  # (L, W, K)
    acc = _horner_routes(tuple(V), c)  # (L, K)
    ok = jnp.all(jnp.stack(oks))
    return acc, ok


def _expand_groups_sorted(pads: list[int], beffs: list[int], nroute: int):
    """(pad, beff) runs sub-chunked so each group's gathered matrix stays
    inside the memory budget (measured in point columns)."""
    out = []
    for w0, w1, beff, pad in _group_windows(pads, beffs):
        wc = max(1, _SORT_BUDGET_COLS // (beff * nroute * pad))
        for ws in range(w0, w1, wc):
            out.append((ws, min(ws + wc, w1), beff, pad))
    return out


_SORTROWS_MIN = 128  # below this the ladder/rowperm paths win


def _impl() -> str:
    """MSM implementation selector: 'sortrows' (default), 'rowperm'
    (round-3/4 inverse-permutation pipeline), or 'staged'
    (HALO_TPU_MSM_IMPL=staged; also the measured-pad fallback path and the
    building block of parallel/msm_sharded)."""
    return os.environ.get("HALO_TPU_MSM_IMPL", "sortrows")


def _staged_msm(points: cv.PointVec, digits, c: int, pads: list[int], beffs: list[int]) -> cv.PointVec:
    """Staged pipeline with PER-GROUP pads: consecutive windows sharing a
    (beff, pad) class are batched into one stage-1 dispatch (the top
    window's doubled bucket mean no longer inflates every window's scatter
    matrix); stages 2-4 run once over the uniform (W, L, B) stack."""
    groups = _group_windows(pads, beffs)
    outs = []
    for w0, w1, beff, pad in groups:
        outs.append(_bucket_sums(points, digits[w0:w1], c, pad))
    S = outs[0] if len(outs) == 1 else tuple(
        jnp.concatenate([o[i] for o in outs], axis=0) for i in range(3)
    )
    return cached_jit(_weight_and_combine, "wc", c, static_argnums=1)(S, c)


def _weight_and_combine(S, c: int):
    """Staged stages 2-4 in one jit: (W, L, B) bucket-sum stack ->
    suffix-doubling weighted sums -> Horner window combine."""
    B = S[0].shape[2]
    T = cv.PointVec(*(jnp.moveaxis(a, 0, 1) for a in S))  # (L, W, B)
    V = _suffix_weight(T, B)  # (L, W)
    return _horner_combine(tuple(V), c)


def _pads_ok(digits, c: int, pads: tuple):
    """Device bool: every window's max nonzero bucket count fits its pad."""
    ms = _max_bucket_counts(digits, c)
    return jnp.all(ms <= jnp.asarray(pads, jnp.int32))


def pinned_pads(n: int, c: int) -> list[int]:
    """Deterministic per-window pads for n roughly-uniform scalars: mean +
    ~6 sigma slack per window, where the top window's mean is scaled by its
    REAL digit bound (canonical Fr < r cuts its range to top_bound buckets,
    e.g. 64 of 256 at c=8 -> 4x the occupancy of a full window)."""
    W = num_windows(c)
    top_bound = ((_fields.R - 1) >> ((W - 1) * c)) + 1

    def pad_for(nbuckets: int) -> int:
        mean = max(1, (max(n, 1) + nbuckets - 1) // nbuckets)
        return _round_pad(mean + 6 * int(np.sqrt(mean)) + 8)

    return [pad_for(max(1, top_bound - 1))] + [pad_for((1 << c) - 1)] * (W - 1)


def msm_flagged(
    points: cv.PointVec,
    scalars,
    c: int | None = None,
    pads: list[int] | None = None,
    rows=None,
    planes=None,
):
    """MSM with PINNED pads: no host round-trip before dispatch.  Returns
    (point, ok) where ok is a DEVICE bool - False means some bucket
    overflowed its pinned pad and the point is unreliable (the caller must
    fall back to msm(), which measures).  Lets latency-critical callers
    (decider/verify paths: one tunnel round trip is ~30 ms) defer every
    fetch to a single combined sync.

    rows: precomputed (N+1, 40/64) row table (rowperm path); planes:
    precomputed (2L/3L, N) coordinate planes (sortrows path) - the URS
    paths pass pp.gs_planes to skip the per-call concat."""
    N = points.x.shape[1]
    if pads is None and N <= 256:
        # tiny fixed-base commits (degree-15 test/dryrun deciders): the
        # exact ladder beats 64 windows of bucket machinery; always valid.
        return msm_ladder(points, scalars), jnp.asarray(True)
    if c is None:
        c = window_size(N)
    if pads is None:
        pads = pinned_pads(N, c)
    beffs = _beffs(c)
    if _impl() == "sortrows" and N >= _SORTROWS_MIN:
        if planes is None:
            points, scalars = _pad_points(points, scalars, 8)
            Np = points.x.shape[1]
            planes = cached_jit(planes_from_points, "pfp", Np)(points)
        else:
            assert planes.shape[1] % 8 == 0, "sortrows planes need N % 8 == 0"
        # ONE fused dispatch (digits + every group + Horner + flag): called
        # outside jit this would otherwise cost ~6 dispatch RPCs through
        # the tunnel
        outs, ok = cached_jit(
            _sortrows_one, "s1", c, tuple(pads), tuple(beffs),
            static_argnums=(2, 3, 4),
        )(planes, scalars, c, tuple(pads), tuple(beffs))
        return outs[0], ok
    if _impl() == "rowperm" or _impl() == "sortrows":
        return _rowperm_msm(points, scalars, c, pads, beffs, rows=rows)
    if any(be * p > _SCATTER_BUDGET_COLS for be, p in zip(beffs, pads)):
        pt = msm(points, scalars, c)
        return pt, jnp.asarray(True)
    digits = cached_jit(_digits, c, static_argnums=1)(scalars, c)
    ok = cached_jit(_pads_ok, "ok", c, tuple(pads), static_argnums=(1, 2))(digits, c, tuple(pads))
    return _staged_msm(points, digits, c, pads, beffs), ok


def _measure_pads(digits, c: int, tag: str = "w") -> list[int]:
    """Per-window max nonzero bucket counts (device -> host sync), rounded
    to pad classes."""
    ms = np.asarray(cached_jit(_max_bucket_counts, tag, c, static_argnums=1)(digits, c))
    return [_round_pad(max(1, int(m))) for m in ms]


def _measure_pad(digits, c: int, tag: str = "w") -> int:
    return max(_measure_pads(digits, c, tag))


def msm(
    points: cv.PointVec, scalars, c: int | None = None, rows=None, planes=None
) -> cv.PointVec:
    """MSM over the Pallas curve: sum_i scalars_i * points_i.

    points: PointVec with batch (N,); scalars: (L, N) Fr limbs.
    Default (sortrows) path: pinned pads, one device round per window
    group, then ONE host sync on the validity flag; the astronomically-rare
    pad overflow falls back to the measured staged path.  rows/planes:
    optional precomputed tables (see msm_flagged).  Returns a single
    projective point (batch ())."""
    N = points.x.shape[1]
    assert scalars.shape == (L, N)
    if c is None:
        c = window_size(N)
    if _impl() in ("sortrows", "rowperm"):
        pt, ok = msm_flagged(
            points, scalars, c=c, pads=pinned_pads(N, c), rows=rows, planes=planes
        )
        if bool(np.asarray(ok)):
            return pt
        return _msm_measured(points, scalars, c)
    return _msm_measured(points, scalars, c)


def _msm_measured(points: cv.PointVec, scalars, c: int | None = None) -> cv.PointVec:
    """Staged-pipeline MSM with MEASURED per-window pads (one host sync)
    and point-chunked fallback for skewed digit distributions.  Correctness
    backstop for the pinned-pad paths and the basis of the sharded MSM."""
    N = points.x.shape[1]
    assert scalars.shape == (L, N)
    if c is None:
        c = window_size(N)
    B = 1 << c
    W = num_windows(c)

    digits = cached_jit(_digits, c, static_argnums=1)(scalars, c)
    pads = _measure_pads(digits, c)
    beffs = _beffs(c)

    fits = all((1 << c) * p <= _SCATTER_BUDGET_COLS for p in pads)
    if fits:
        return _staged_msm(points, digits, c, pads, beffs)

    pad = max(pads)
    if B * pad <= _SCATTER_BUDGET_COLS:
        S = _bucket_sums(points, digits, c, pad)
    else:
        # One window's scatter matrix exceeds the budget: chunk the POINTS
        # and combine per-chunk bucket sums with complete adds.  Per-chunk
        # pads are re-measured so skewed digit distributions only increase
        # the chunk count, never the memory (ADVICE.md round 1, medium).
        K = 2
        while True:
            points, scalars = _pad_points(points, scalars, K)
            if points.x.shape[1] != digits.shape[1]:
                digits = cached_jit(_digits, c, static_argnums=1)(scalars, c)
            Np = digits.shape[1]
            Nc = Np // K
            dk = digits.reshape(W * K, Nc)
            padk = _measure_pad(dk, c, "k")
            if B * padk <= _SCATTER_BUDGET_COLS or Nc == 1:
                break
            if K >= 64 and c > 3:
                # pathologically skewed digits (e.g. near-constant scalars):
                # restart with tiny windows so B*pad is bounded by 8*Nc.
                return _msm_measured(points, scalars, c=3)
            K *= 2
        S = None
        comb = cached_jit(_combine_sums, "cs")
        for k in range(K):
            lo, hi = k * Nc, (k + 1) * Nc
            pk = cv.PointVec(*(a[:, lo:hi] for a in points))
            Sk = _bucket_sums(pk, digits[:, lo:hi], c, padk)
            S = Sk if S is None else comb(S, Sk)

    return cached_jit(_weight_and_combine, "wc", c, static_argnums=1)(S, c)


# ---------------------------------------------------------------------------
# Shape-classed MSM for the IPA open inner loop (pcdl.open_).
#
# open() issues 2 MSMs per fold round at widths n/2, n/4, ..., 1.  Exact
# shapes would compile a fresh fused kernel per (width, pad) pair - tens of
# multi-second XLA compiles per degree.  Instead the width is padded to a
# factor-4 ladder (identity points / zero scalars are near-free: zero digits
# land in the dump bucket) and the pad is pinned per class to a deterministic
# value covering the class's worst expected bucket count, so the whole lg(n)
# fold loop reuses O(log_4 n) compiled kernels.  The measured pad still wins
# if a skewed input exceeds the class pad (correctness never depends on the
# heuristic).

_CLASS_MIN = 128


def _width_class(m: int) -> int:
    cls = _CLASS_MIN
    while cls < m:
        cls *= 4
    return cls


def msm_classed(points: cv.PointVec, scalars, flags: list | None = None) -> cv.PointVec:
    """MSM with width padded to the class ladder and PINNED pad classes -
    no measurement round-trip at all.  If `flags` is a list, a device bool
    ("every bucket fit its pinned pad") is appended; the caller folds all
    flags into one deferred fetch and falls back to the measured msm() on
    the astronomically-rare overflow (see pcdl.open_).  Without `flags`,
    the pads are measured (one sync) and merged, so the result is always
    valid."""
    m = points.x.shape[1]
    cls = _width_class(m)
    if cls <= _CLASS_MIN:
        # tiny widths: the exact windowed ladder beats the whole
        # sort/gather/bucket machinery - one compiled kernel, no pads.
        pt = msm_ladder(points, scalars)
        if flags is not None:
            flags.append(jnp.asarray(True))
        return pt
    c = 5
    points, scalars = _pad_points(points, scalars, cls)
    pads = pinned_pads(cls, c)
    beffs = _beffs(c)
    if _impl() == "rowperm":
        pt, okv = _rowperm_msm(points, scalars, c, pads, beffs)
        if flags is not None:
            flags.append(okv)
            return pt
        if bool(np.asarray(okv)):
            return pt
        return _msm_measured(points, scalars, c)
    digits = cached_jit(_digits, c, static_argnums=1)(scalars, c)
    if flags is not None:
        flags.append(
            cached_jit(_pads_ok, "okc", c, tuple(pads), static_argnums=(1, 2))(
                digits, c, tuple(pads)
            )
        )
    else:
        pads = [max(p, q) for p, q in zip(pads, _measure_pads(digits, c, "cl"))]
    if any((1 << c) * p > _SCATTER_BUDGET_COLS for p in pads):
        return _msm_measured(points, scalars)  # absurdly skewed: chunked path
    return _staged_msm(points, digits, c, pads, beffs)


# ---------------------------------------------------------------------------
# Staged pipeline (4 separate dispatches): memory-chunked fallback and the
# building blocks of the sharded MSM (parallel/msm_sharded.py).


def _bucket_sums_chunk(points: cv.PointVec, digits, c: int, pad: int):
    """Staged stage 1 (per window group): bucket sums with the window axis
    as a real vectorized array axis - NO loop.  (Wc, N) digits ->
    (Wc, L, B).  Scatter indices are (window, column) pairs, never a
    flattened int32 product, so index arithmetic cannot overflow."""
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
    widx = jnp.broadcast_to(jnp.arange(Wc, dtype=jnp.int32)[:, None], (Wc, N)).reshape(Wc * N)
    colf = col.reshape(Wc * N)
    ident = cv.identity((Wc, B * pad))
    M = cv.PointVec(
        ident.x.at[:, widx, colf].set(pts.x),
        ident.y.at[:, widx, colf].set(pts.y),
        ident.z.at[:, widx, colf].set(pts.z),
    )
    M = cv.PointVec(*(a.reshape(L, Wc, B, pad) for a in M))
    S = cv.sum_points(M, axis=2)  # (L, Wc, B)
    return tuple(jnp.moveaxis(a, 0, 1) for a in S)  # (Wc, L, B)


def _bucket_sums(points: cv.PointVec, digits, c: int, pad: int):
    """Staged stage 1: per-window bucket sums, (W, N) digits -> (W, L, B),
    grouping windows per dispatch to stay inside the scatter budget."""
    W, N = digits.shape
    B = 1 << c
    assert B * pad <= _SCATTER_BUDGET_COLS, "caller must chunk points first"
    Wg = max(1, _SCATTER_BUDGET_COLS // (B * pad))
    outs = []
    for w0 in range(0, W, Wg):
        wc = min(Wg, W - w0)
        k = cached_jit(_bucket_sums_chunk, "bsc", c, pad, wc, static_argnums=(2, 3))
        outs.append(k(points, digits[w0 : w0 + wc], c, pad))
    if len(outs) == 1:
        return outs[0]
    return tuple(jnp.concatenate([o[i] for o in outs], axis=0) for i in range(3))


def _combine_sums(a, b):
    """Complete-add two (W, L, B) partial bucket-sum stacks."""
    A = cv.PointVec(*(jnp.moveaxis(x, 1, 0) for x in a))
    Bv = cv.PointVec(*(jnp.moveaxis(x, 1, 0) for x in b))
    C = cv.padd(A, Bv)
    return tuple(jnp.moveaxis(x, 0, 1) for x in C)


def _suffix_mask(xs, c: int):
    """Staged stage 2: bucket-weight application.  Suffix sums
    T_b = sum_{j>=b} S_j give sum_{b>=1} T_b = sum_b b*S_b; bucket 0 (the
    zero-digit dump) is masked to the identity.  (W, L, B) -> (W, L, B)."""
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


def _window_reduce(xs):
    """Staged stage 3: tree-reduce the bucket axis, (W, L, B) -> per-window
    single points (L, W)."""
    T = cv.PointVec(*(jnp.moveaxis(a, 0, 1) for a in xs))  # (L, W, B)
    R = cv.sum_points(T, axis=1)
    return tuple(R)  # (L, W)


def _horner_combine(xs, c: int):
    """Staged stage 4: Horner over windows on SINGLE points (msb window
    first): acc <- 2^c * acc + T_w."""
    seq = tuple(jnp.moveaxis(a, 1, 0) for a in xs)  # (W, L)

    def body(acc, t):
        acc = jax.lax.fori_loop(0, c, lambda _, p: cv.pdbl(p), acc)
        return cv.padd(acc, cv.PointVec(*t)), 0.0

    acc, _ = jax.lax.scan(body, cv.identity(()), seq)
    return acc


def _pad_points(points: cv.PointVec, scalars, m: int):
    """Pad the point/scalar vectors to a multiple of m with identity points
    and zero scalars (free: zero digits go to the dump bucket)."""
    N = points.x.shape[1]
    Np = ((N + m - 1) // m) * m
    if Np == N:
        return points, scalars
    extra = Np - N
    ident = cv.identity((extra,))
    points = cv.PointVec(*(jnp.concatenate([a, b], axis=1) for a, b in zip(points, ident)))
    scalars = jnp.concatenate([scalars, FR.zeros((extra,))], axis=1)
    return points, scalars


# ---------------------------------------------------------------------------
# Reference-grade slow paths (independent checks) and batched row MSMs.


def msm_ladder(points: cv.PointVec, scalars) -> cv.PointVec:
    """Exact 4-bit windowed-ladder MSM (msm_rows at batch 1), width padded
    to the {128, 256} class: the right tool for tiny widths, where the
    bucket machinery's 51-window sort/gather costs far more than it saves.
    Always exact (no pinned pads).  This is the prover's per-round L/R MSM
    at small degrees (pcdl.open_) and the dryrun/test hot path."""
    N = points.x.shape[1]
    cls = 128 if N <= 128 else 256 if N <= 256 else _width_class(N)
    points, scalars = _pad_points(points, scalars, cls)
    P1 = cv.PointVec(*(a[:, None, :] for a in points))
    R = cached_jit(msm_rows, "r1", cls)(P1, scalars[:, None, :])
    return cv.PointVec(R.x[:, 0], R.y[:, 0], R.z[:, 0])


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
    (L, B, M) -> one point per row (batch (B,)).

    Used to verify many succinct checks at once: each row is one proof's
    deferred group equation (2 lg d + 4 points).  4-bit windowed
    double-and-add over the 255 shared bit positions with per-lane table
    gathers + a tree sum over M; the whole batch advances in lockstep on
    the VPU."""
    B, M = points.x.shape[1:]
    s = FR.canon(scalars)
    # per-lane table of 0..15 multiples: (16, L, B, M) coords
    ident = cv.identity((B, M))
    tab = [ident, points]
    for j in range(2, 16):
        tab.append(cv.padd(tab[j - 1], points))
    table = cv.PointVec(
        jnp.stack([t.x for t in tab]),
        jnp.stack([t.y for t in tab]),
        jnp.stack([t.z for t in tab]),
    )  # (16, L, B, M)

    nwin = 64  # ceil(255 / 4); top window is 3 bits

    def body(i, acc):
        acc = cv.pdbl(cv.pdbl(cv.pdbl(cv.pdbl(acc))))
        sh = 4 * (nwin - 1 - i)
        q, r = sh // 15, (sh % 15).astype(jnp.uint32)
        lim = s[q]
        nxt = jnp.where(q + 1 < L, s[jnp.minimum(q + 1, L - 1)], jnp.zeros_like(lim))
        d = ((lim >> r) | jnp.where(r > 0, nxt << (jnp.uint32(15) - r), jnp.zeros_like(nxt))) & jnp.uint32(15)
        T = cv.PointVec(
            jnp.take_along_axis(table.x, d[None, None].astype(jnp.int32), axis=0)[0],
            jnp.take_along_axis(table.y, d[None, None].astype(jnp.int32), axis=0)[0],
            jnp.take_along_axis(table.z, d[None, None].astype(jnp.int32), axis=0)[0],
        )
        return cv.padd(acc, cv.sum_points(T, axis=1))

    return jax.lax.fori_loop(0, nwin, body, cv.identity((B,)))
