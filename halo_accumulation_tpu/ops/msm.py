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
  * PAD (max points per bucket) is measured on device PER WINDOW and fixed
    per call on the host, so kernels stay static-shaped; pads are rounded
    to {2^k, 3*2^(k-1)} classes to bound the jit cache.  Windows are
    grouped into runs sharing (bucket count, pad): the top window - whose
    digit range is cut down by the field modulus (canonical Fr < r ~ 2^254)
    and by 255 mod c - gets its own smaller bucket space and larger pad
    instead of inflating every window's scatter matrix (the round-1 failure
    mode at N=2^20).
  * The hot path is a SINGLE fused dispatch per window group: a lax.scan
    over the group's windows whose body does sort -> scatter -> pad tree
    reduce -> suffix weighted sum -> Horner carry (_pippenger).  Round 1 of
    this build hit a TPU backend bug where exactly this fused graph
    returned off-curve garbage at N >= 1024; on the current stack the
    reproducers (tools/tpu_fusion_probe.py, tools/tpu_msm_check.py) pass,
    the fused path is ~5x faster than split dispatches (HBM
    materialization between stages), and bench.py cross-checks fused vs
    staged on device at startup.  HALO_TPU_FORCE_STAGED=1 reverts to the
    4-dispatch staged pipeline (_bucket_sums -> _suffix_mask ->
    _window_reduce -> _horner_combine), which is also the fallback when a
    window group's scatter matrix exceeds the memory budget (points are
    then chunked and per-chunk bucket sums combined with complete adds, so
    a skewed digit distribution can never blow past the budget - it only
    increases the chunk count).
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


def window_size(n: int) -> int:
    """Bucket-width heuristic.  Balances stage-1 scatter cost
    W*B*pad ~ W*N*(pad/mean) against the suffix scan's W*B*c and the
    per-window sort/gather overhead."""
    if n >= (1 << 18):
        return 13
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
    """Round a measured bucket count up to the next {2^k, 3*2^(k-1)} class:
    bounds jit-cache growth while capping pad overhead at ~33%."""
    if m <= 2:
        return max(1, m)
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


def _pippenger(points: cv.PointVec, digits, c: int, pad: int, beff: int | None = None) -> cv.PointVec:
    """Fused Pippenger over a (group of) window(s): ONE dispatch.

    lax.scan over the windows (msb first); the body sorts the digits,
    scatters points into a (beff x pad) matrix, tree-reduces the pad axis,
    applies bucket weights via a suffix scan, reduces to the window's
    single point, and Horner-carries: acc <- 2^c * acc + W_w.
    Returns sum_w 2^(c*(k-1-w)) * W_w for the k windows given."""
    W, N = digits.shape
    B = beff or (1 << c)
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
        S = cv.sum_points(M, axis=1)  # (L, B): bucket sums
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


def _shift_add(acc: cv.PointVec, part: cv.PointVec, k: int) -> cv.PointVec:
    """acc * 2^k + part (combining window-group partials, msb first)."""
    acc = jax.lax.fori_loop(0, k, lambda _, p: cv.pdbl(p), acc)
    return cv.padd(acc, part)


def _group_windows(pads: list[int], beffs: list[int]):
    """Runs of consecutive windows sharing (beff, pad) -> [(w0, w1, beff, pad)]."""
    groups = []
    w0 = 0
    for w in range(1, len(pads) + 1):
        if w == len(pads) or (pads[w], beffs[w]) != (pads[w0], beffs[w0]):
            groups.append((w0, w, beffs[w0], pads[w0]))
            w0 = w
    return groups


def _grouped_msm(points: cv.PointVec, digits, c: int, pads: list[int], beffs: list[int]) -> cv.PointVec:
    """Fused-dispatch MSM: one _pippenger per window group + tiny combines."""
    groups = _group_windows(pads, beffs)
    acc = None
    for w0, w1, beff, pad in groups:
        k = cached_jit(_pippenger, "pip", c, pad, beff, w1 - w0, static_argnums=(2, 3, 4))
        part = k(points, digits[w0:w1], c, pad, beff)
        if acc is None:
            acc = part
        else:
            sa = cached_jit(_shift_add, "sa", c * (w1 - w0), static_argnums=2)
            acc = sa(acc, part, c * (w1 - w0))
    return acc


def _use_fused() -> bool:
    """The scan-over-windows fused kernel is OPT-IN (HALO_TPU_FORCE_FUSED=1):
    with the Pallas point kernels routing cv.padd/pdbl, the batched-window
    staged pipeline issues ~30x fewer, ~30x larger device calls and wins
    (the fused scan pays per-window launch overhead; measured 195 ms vs
    <institutional staged numbers in BENCH logs> at N=2^14).
    HALO_TPU_FORCE_STAGED=1 is a no-op left for compatibility (staged is
    the default)."""
    if os.environ.get("HALO_TPU_FORCE_STAGED", "0") == "1":
        return False
    return os.environ.get("HALO_TPU_FORCE_FUSED", "0") == "1"


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
    t = cached_jit(_suffix_mask, "sm", c, static_argnums=1)(S, c)
    r = cached_jit(_window_reduce, "wr")(t)
    return cached_jit(_horner_combine, "hc", c, static_argnums=1)(r, c)


def _pads_ok(digits, c: int, pads: tuple):
    """Device bool: every window's max nonzero bucket count fits its pad."""
    ms = _max_bucket_counts(digits, c)
    return jnp.all(ms <= jnp.asarray(pads, jnp.int32))


def pinned_pads(n: int, c: int) -> list[int]:
    """Deterministic per-window pads for n roughly-uniform scalars: mean +
    ~6 sigma slack, doubled for the top window (its digit range is halved
    by the modulus, so its bucket mean doubles)."""
    base = _class_pad(max(n, 1), c)
    return [_round_pad(2 * base)] + [base] * (num_windows(c) - 1)


def msm_flagged(points: cv.PointVec, scalars, c: int | None = None, pads: list[int] | None = None):
    """MSM with PINNED pads: no host round-trip before dispatch.  Returns
    (point, ok) where ok is a DEVICE bool - False means some bucket
    overflowed its pinned pad and the point is unreliable (the caller must
    fall back to msm(), which measures).  Lets latency-critical callers
    (decider/verify paths: one tunnel round trip is ~30 ms) defer every
    fetch to a single combined sync."""
    N = points.x.shape[1]
    if c is None:
        c = window_size(N)
    if pads is None:
        pads = pinned_pads(N, c)
    beffs = _beffs(c)
    if any(be * p > _SCATTER_BUDGET_COLS for be, p in zip(beffs, pads)):
        pt = msm(points, scalars, c)
        return pt, jnp.asarray(True)
    digits = cached_jit(_digits, c, static_argnums=1)(scalars, c)
    ok = cached_jit(_pads_ok, "ok", c, tuple(pads), static_argnums=(1, 2))(digits, c, tuple(pads))
    fn = _grouped_msm if _use_fused() else _staged_msm
    return fn(points, digits, c, pads, beffs), ok


def _measure_pads(digits, c: int, tag: str = "w") -> list[int]:
    """Per-window max nonzero bucket counts (device -> host sync), rounded
    to pad classes."""
    ms = np.asarray(cached_jit(_max_bucket_counts, tag, c, static_argnums=1)(digits, c))
    return [_round_pad(max(1, int(m))) for m in ms]


def _measure_pad(digits, c: int, tag: str = "w") -> int:
    return max(_measure_pads(digits, c, tag))


def msm(points: cv.PointVec, scalars, c: int | None = None) -> cv.PointVec:
    """MSM over the Pallas curve: sum_i scalars_i * points_i.

    points: PointVec with batch (N,); scalars: (L, N) Fr limbs.
    Host-orchestrated: digit extraction and per-window bucket-size
    measurement run first (one host sync), then one fused dispatch per
    window group (see module docstring).  Returns a single projective
    point (batch ()).
    """
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
        if _use_fused():
            return _grouped_msm(points, digits, c, pads, beffs)
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
                return msm(points, scalars, c=3)
            K *= 2
        S = None
        comb = cached_jit(_combine_sums, "cs")
        for k in range(K):
            lo, hi = k * Nc, (k + 1) * Nc
            pk = cv.PointVec(*(a[:, lo:hi] for a in points))
            Sk = _bucket_sums(pk, digits[:, lo:hi], c, padk)
            S = Sk if S is None else comb(S, Sk)

    t = cached_jit(_suffix_mask, "sm", c, static_argnums=1)(S, c)
    r = cached_jit(_window_reduce, "wr")(t)
    return cached_jit(_horner_combine, "hc", c, static_argnums=1)(r, c)


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


def _class_pad(cls: int, c: int) -> int:
    """Deterministic pad covering the max bucket count of cls uniform digits
    over 2^c - 1 nonzero buckets with ample slack (mean + ~6 sigma)."""
    mean = max(1, cls >> c)
    return _round_pad(mean + 6 * int(np.sqrt(mean)) + 8)


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
    c = 5
    points, scalars = _pad_points(points, scalars, cls)
    digits = cached_jit(_digits, c, static_argnums=1)(scalars, c)
    base = _class_pad(cls, c)
    pads = [_round_pad(2 * base)] + [base] * (num_windows(c) - 1)
    if flags is not None:
        flags.append(
            cached_jit(_pads_ok, "okc", c, tuple(pads), static_argnums=(1, 2))(
                digits, c, tuple(pads)
            )
        )
    else:
        pads = [max(p, q) for p, q in zip(pads, _measure_pads(digits, c, "cl"))]
    beffs = _beffs(c)
    if any((1 << c) * p > _SCATTER_BUDGET_COLS for p in pads):
        return msm(points, scalars)  # absurdly skewed: full path with chunking
    fn = _grouped_msm if _use_fused() else _staged_msm
    return fn(points, digits, c, pads, beffs)


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
