"""MSM kernels vs the oracle, including adversarial digit distributions
(all-equal scalars, zero-heavy padded vectors) that stress the dump-bucket
and PAD logic."""

import numpy as np
import pytest

from halo_accumulation_tpu import fields as F
from halo_accumulation_tpu.ops import curve as cv, msm
from halo_accumulation_tpu.ops.field import FR


def rand_points(rng, n):
    G = (F.G_X, F.G_Y)
    return [F.p_mul(int.from_bytes(rng.bytes(40), "little") % F.R, G) for _ in range(n)]


def run_msm(points_aff, scalars_int, **kw):
    P = cv.from_affine_ints(points_aff)
    s = FR.from_ints(scalars_int)
    R = msm.msm(P, s, **kw)
    x, y, inf = cv.to_affine(cv.PointVec(R.x[:, None], R.y[:, None], R.z[:, None]))
    from halo_accumulation_tpu.ops.field import FQ

    if bool(np.asarray(inf)[0]):
        return None
    return (int(FQ.to_ints(x)[0]), int(FQ.to_ints(y)[0]))


@pytest.mark.parametrize("n", [4, 37, 128])
def test_msm_random(rng, n):
    pts = rand_points(rng, n)
    ss = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(n)]
    assert run_msm(pts, ss) == F.p_msm(ss, pts)


def test_msm_adversarial(rng):
    n = 64
    pts = rand_points(rng, n)
    # all-equal scalars: every nonzero digit lands in one bucket (PAD = N)
    s_eq = [12345678901234567890] * n
    assert run_msm(pts, s_eq) == F.p_msm(s_eq, pts)
    # zero-heavy: only first 2 nonzero (commit to a degree-1 poly padded to n)
    s_sparse = [7, 11] + [0] * (n - 2)
    assert run_msm(pts, s_sparse) == F.p_msm(s_sparse, pts)
    # all zeros
    assert run_msm(pts, [0] * n) is None
    # includes identity points
    pts2 = pts[:4] + [None] * 4
    ss = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(8)]
    assert run_msm(pts2, ss) == F.p_msm(ss, pts2[:4] + [None] * 4)
    # scalars at field boundary
    s_edge = [F.R - 1, 1, F.R - 2, 2] + [0] * 4
    assert run_msm(pts2, s_edge) == F.p_msm(s_edge[:4], pts2[:4])


def test_msm_chunked_paths(rng, monkeypatch):
    """Force the point-chunking and window-group paths of the STAGED
    backstop with a tiny scatter budget; results must still match the
    oracle (covers the round-1 tail bug and the ADVICE.md budget-overrun
    finding)."""
    monkeypatch.setenv("HALO_TPU_MSM_IMPL", "staged")
    n = 96  # non-power-of-two: exercises _pad_points inside the chunk path
    pts = rand_points(rng, n)
    ss = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(n)]
    monkeypatch.setattr(msm, "_SCATTER_BUDGET_COLS", 64)
    assert run_msm(pts, ss, c=3) == F.p_msm(ss, pts)
    monkeypatch.setattr(msm, "_SCATTER_BUDGET_COLS", 256)
    assert run_msm(pts, ss, c=3) == F.p_msm(ss, pts)


def test_msm_rowperm_matches(rng, monkeypatch):
    """The row-permutation path (the default) == oracle, including its
    sub-chunked window groups under a small budget."""
    monkeypatch.setenv("HALO_TPU_MSM_IMPL", "rowperm")
    n = 64
    pts = rand_points(rng, n)
    ss = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(n)]
    assert run_msm(pts, ss, c=4) == F.p_msm(ss, pts)
    # flagged variant: pinned pads, device ok flag must be True for
    # uniform scalars, and the point must match (pads passed explicitly:
    # tiny widths without pads take the exact-ladder shortcut instead)
    P = cv.from_affine_ints(pts)
    s = FR.from_ints(ss)
    R, ok = msm.msm_flagged(P, s, c=4, pads=msm.pinned_pads(n, 4))
    assert bool(np.asarray(ok))
    assert run_point(R) == F.p_msm(ss, pts)
    # sub-chunked groups (wc=1) under a tiny budget
    monkeypatch.setattr(msm, "_SCATTER_BUDGET_COLS", 1024)
    R2, ok2 = msm.msm_flagged(P, s, c=4, pads=msm.pinned_pads(n, 4))
    assert bool(np.asarray(ok2))
    assert run_point(R2) == F.p_msm(ss, pts)


def test_msm_rowperm_overflow_flag(rng, monkeypatch):
    """Constant scalars overflow one bucket: the pinned-pad flag must go
    False and msm() must still return the right point via the measured
    fallback."""
    monkeypatch.setenv("HALO_TPU_MSM_IMPL", "rowperm")
    n = 64
    pts = rand_points(rng, n)
    ss = [12345] * n  # every window's digit identical -> bucket count = n
    P = cv.from_affine_ints(pts)
    s = FR.from_ints(ss)
    _, ok = msm.msm_flagged(P, s, c=4, pads=[4] * msm.num_windows(4))
    assert not bool(np.asarray(ok))
    assert run_msm(pts, ss, c=4) == F.p_msm(ss, pts)


def test_msm_affine_rows(rng, monkeypatch):
    """Affine (x||y, Z synthesized from the slot sentinel) row tables must
    match the oracle, including zero scalars (all-sentinel buckets) whose
    slots must decode as the identity (0:1:0), not (0:0:0)."""
    monkeypatch.setenv("HALO_TPU_MSM_IMPL", "rowperm")
    n = 64
    pts = rand_points(rng, n)
    P = cv.from_affine_ints(pts)
    rows = msm.rows_from_affine(P.x, P.y)
    for ss in (
        [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(n)],
        [7, 11] + [0] * (n - 2),  # zero-heavy: most slots are sentinels
    ):
        s = FR.from_ints(ss)
        got = msm.msm(P, s, c=4, rows=rows)
        assert run_point(got) == F.p_msm(ss, pts)


def test_crosscheck_paths_differ(rng, monkeypatch):
    """bench.py's rowperm-vs-ladder cross-check must dispatch two GENUINELY
    different pipelines (round-2 VERDICT: the old check compared one
    pipeline against itself)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    calls = {"rowperm": 0, "ladder": 0}
    orig_rp, orig_ld = msm._rowperm_msm, msm.msm_ladder

    def rp(*a, **k):
        calls["rowperm"] += 1
        return orig_rp(*a, **k)

    def ld(*a, **k):
        calls["ladder"] += 1
        return orig_ld(*a, **k)

    monkeypatch.setattr(msm, "_rowperm_msm", rp)
    monkeypatch.setattr(msm, "msm_ladder", ld)
    assert bench.crosscheck_rowperm_vs_ladder(n=64)
    assert calls["rowperm"] == 1 and calls["ladder"] == 1


def test_msm_classed(rng):
    """Shape-classed MSM (open()'s inner-loop variant) vs oracle at widths
    off the class ladder."""
    for n in (5, 100, 130):
        pts = rand_points(rng, n)
        ss = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(n)]
        P = cv.from_affine_ints(pts)
        s = FR.from_ints(ss)
        R = msm.msm_classed(P, s)  # measured-pad variant
        got = run_point(R)
        assert got == F.p_msm(ss, pts)
    # pinned-pad + deferred-flag variant (the open() inner-loop path)
    flags = []
    R = msm.msm_classed(P, s, flags=flags)
    assert flags and bool(np.asarray(flags[0]))
    assert run_point(R) == F.p_msm(ss, pts)


def run_point(R):
    import numpy as _np

    from halo_accumulation_tpu.ops.field import FQ

    x, y, inf = cv.to_affine(cv.PointVec(R.x[:, None], R.y[:, None], R.z[:, None]))
    if bool(_np.asarray(inf)[0]):
        return None
    return (int(FQ.to_ints(x)[0]), int(FQ.to_ints(y)[0]))


def test_perm_slots_packed_boundary():
    """Pin _perm_slots at the packed-sort uint32 boundary
    beff << ibits == 2^32 (c=12 at N=2^20 - ADVICE r4 high): points in the
    TOP bucket must not be silently dropped to the identity sentinel."""
    import jax.numpy as jnp

    N = 1 << 20
    beff = 4096  # ibits = 20 -> beff << ibits == 2^32 exactly
    d = np.zeros((1, N), np.uint32)
    d[0, 5] = beff - 1  # one point in the top bucket
    d[0, 7] = 1  # one point in the bottom nonzero bucket
    src, ok = msm._perm_slots(jnp.asarray(d), 4, beff)
    src = np.asarray(src)
    assert bool(np.asarray(ok))
    assert src[0, beff - 1] == 5  # previously: sentinel (dropped), ok=True
    assert src[1, beff - 1] == N
    assert src[0, 1] == 7


def test_msm_naive_matches(rng):
    n = 16
    pts = rand_points(rng, n)
    ss = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(n)]
    P = cv.from_affine_ints(pts)
    s = FR.from_ints(ss)
    from halo_accumulation_tpu.runtime import cached_jit

    R1 = cached_jit(msm.msm_naive)(P, s)
    R2 = msm.msm(P, s)
    assert bool(np.asarray(cached_jit(cv.peq)(R1, R2)))


def test_fold_basis_oracle(rng):
    """msm.fold_basis (the prover's 4-round basis collapse) vs the host
    oracle: B'[j] == sum_h t16[h] * B[h*(W/16)+j]."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    from halo_accumulation_tpu import pp as pp_mod
    from halo_accumulation_tpu.ops.field import FQ

    W = 256
    pp = pp_mod.get_pp(W, use_disk_cache=True)
    planes = pp.gs_planes(W)
    gs = pp.gs_host(W)
    t16_i = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(16)]
    out, inf = jax.jit(msm.fold_basis)(planes, FR.from_ints(t16_i))
    assert not bool(np.asarray(inf))
    ox, oy = msm.unpack_affine_planes(out)
    xs, ys = FQ.to_ints(ox), FQ.to_ints(oy)
    w2 = W // 16
    for j in range(0, w2, 3):
        want = F.p_msm(t16_i, [gs[h * w2 + j] for h in range(16)])
        assert (int(xs[j]), int(ys[j])) == want, f"lane {j}"
