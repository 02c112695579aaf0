"""PCDL: discrete-log polynomial commitment (Bulletproofs-style IPA).

Functional mirror of /root/reference/code/src/pcdl.rs (commit :99, open
:120, succinct_check :252, check :323), re-architected host/device:

  * All Fiat-Shamir hashing and single-point bookkeeping runs on the host
    (python ints + SHA3); all bulk field/group math runs on device as
    vectorized limb kernels.
  * succinct_check is a pure host transcript replay followed by ONE small
    MSM - every challenge depends only on proof data, so unlike the Rust
    (which interleaves hashes with per-round point ops) the group work
    collapses into a single batched check.  This is what makes batched
    verification embarrassingly parallel on a TPU.
  * open() keeps the lg(n) sequential fold rounds (they are inherently
    sequential in the transcript) but each round is one fused device step:
    two MSMs + one shared-scalar fold sweep across all lanes.

Proof objects live on the host and carry canonical ints; they serialize in
ark-serialize-compatible layout (EvalProof in the reference has no
serialization at all - pcdl.rs:22-30 derives only Clone/PartialEq - so
checkpoint/resume of proofs is a capability the reference lacks).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from halo_accumulation_tpu import fields as F
from halo_accumulation_tpu import hostops as H
from halo_accumulation_tpu import pp as pp_mod
from halo_accumulation_tpu.ops import curve as cv, msm as msm_mod, poly as poly_mod
from halo_accumulation_tpu.ops.field import FQ, FR, L, W
from halo_accumulation_tpu.runtime import cached_jit
from halo_accumulation_tpu.utils import serialize as ser
from halo_accumulation_tpu.utils import transcript as tr

Point = tuple | None  # host affine point: (x, y) ints or None for infinity


def point_to_host(P: cv.PointVec) -> Point:
    """Single projective device point -> host affine ints.  ONE device
    fetch (the remote-tunnel round trip costs ~30 ms, so the three
    coordinates are stacked and pulled together)."""
    import jax
    import jax.numpy as jnp

    arr = np.asarray(jax.device_get(jnp.stack([P.x, P.y, P.z]))).astype(object)
    x, y, z = arr[0], arr[1], arr[2]
    xi = sum(int(x[i]) << (W * i) for i in range(L))
    yi = sum(int(y[i]) << (W * i) for i in range(L))
    zi = sum(int(z[i]) << (W * i) for i in range(L)) % F.Q
    if zi == 0:
        return None
    zinv = pow(zi, -1, F.Q)
    return (xi * zinv % F.Q, yi * zinv % F.Q)


def _point_and_flag_to_host(P: cv.PointVec, ok):
    """Fetch one projective point + a bool flag in a SINGLE device pull."""
    import jax
    import jax.numpy as jnp

    blob = np.asarray(
        jax.device_get(
            cached_jit(
                lambda p, o: jnp.concatenate([p.x, p.y, p.z, o[None].astype(jnp.uint32)])
            )(P, ok)
        )
    ).astype(object)
    x, y, z = blob[0:L], blob[L : 2 * L], blob[2 * L : 3 * L]
    okh = bool(blob[3 * L])
    xi = sum(int(x[i]) << (W * i) for i in range(L))
    yi = sum(int(y[i]) << (W * i) for i in range(L))
    zi = sum(int(z[i]) << (W * i) for i in range(L)) % F.Q
    if zi == 0:
        return None, okh
    zinv = pow(zi, -1, F.Q)
    return (xi * zinv % F.Q, yi * zinv % F.Q), okh


def points_to_host(Ps: list[cv.PointVec]) -> list[Point]:
    """Batch-convert several single device points with ONE fetch."""
    import jax
    import jax.numpy as jnp

    arr = np.asarray(
        jax.device_get(jnp.stack([jnp.stack([P.x, P.y, P.z]) for P in Ps]))
    ).astype(object)
    out = []
    for k in range(len(Ps)):
        x, y, z = arr[k, 0], arr[k, 1], arr[k, 2]
        xi = sum(int(x[i]) << (W * i) for i in range(L))
        yi = sum(int(y[i]) << (W * i) for i in range(L))
        zi = sum(int(z[i]) << (W * i) for i in range(L)) % F.Q
        if zi == 0:
            out.append(None)
            continue
        zinv = pow(zi, -1, F.Q)
        out.append((xi * zinv % F.Q, yi * zinv % F.Q))
    return out


def msm_device(points_host_or_vec, scalars_ints) -> Point:
    """MSM entry taking host scalars; uses the device Pippenger kernel."""
    if isinstance(points_host_or_vec, cv.PointVec):
        P = points_host_or_vec
    else:
        P = cv.from_affine_ints(points_host_or_vec)
    s = FR.from_ints(scalars_ints)
    return point_to_host(msm_mod.msm(P, s))


def host_msm(scalars, points) -> Point:
    """Tiny host MSM via the int oracle (for <= a handful of points)."""
    return H.p_msm(scalars, points)


@dataclass
class HPoly:
    """h(X) represented by its lg(n)+1 challenges (pcdl.rs:44-92)."""

    xis: list  # python ints, length lg_n + 1

    def eval(self, z: int) -> int:
        return poly_mod.h_eval_host(self.xis, z, F.R)

    def coeffs_device(self):
        """Dense coefficients (L, n) via the O(n) tensor expansion."""
        return poly_mod.tensor_h_coeffs(FR.from_ints(self.xis))

    def serialize(self) -> bytes:
        """ark derive(CanonicalSerialize) for struct { xis: Vec<Fr> }."""
        return ser.ser_scalar_vec(self.xis)


@dataclass
class EvalProof:
    """pi = (L, R, U, c, C_bar, w') (pcdl.rs:22-30)."""

    Ls: list  # list[Point]
    Rs: list
    U: Point
    c: int
    C_bar: Point | None
    w_prime: int | None

    def serialize(self) -> bytes:
        out = ser.ser_vec([ser.ser_point(P) for P in self.Ls])
        out += ser.ser_vec([ser.ser_point(P) for P in self.Rs])
        out += ser.ser_point(self.U)
        out += ser.ser_scalar(self.c)
        out += ser.ser_option(None if self.C_bar is None else ser.ser_point(self.C_bar))
        out += ser.ser_option(None if self.w_prime is None else ser.ser_scalar(self.w_prime))
        return out

    @classmethod
    def deserialize(cls, b: bytes) -> "EvalProof":
        off = 0

        def take(n):
            nonlocal off
            chunk = b[off : off + n]
            off += n
            return chunk

        def take_vec_points():
            n = int.from_bytes(take(8), "little")
            return [ser.deser_point(take(ser.POINT_BYTES)) for _ in range(n)]

        Ls = take_vec_points()
        Rs = take_vec_points()
        U = ser.deser_point(take(ser.POINT_BYTES))
        c = int.from_bytes(take(32), "little")
        C_bar = w_prime = None
        if take(1) == b"\x01":
            C_bar = ser.deser_point(take(ser.POINT_BYTES))
        if take(1) == b"\x01":
            w_prime = int.from_bytes(take(32), "little")
        return cls(Ls, Rs, U, c, C_bar, w_prime)


def _gs_tables(pp: pp_mod.PublicParams, k: int) -> dict:
    """Precomputed URS table kwarg for the active MSM impl (only the one it
    uses: each table is O(N) device memory at large degree)."""
    if msm_mod._impl() == "sortrows" and k >= msm_mod._SORTROWS_MIN:
        return {"planes": pp.gs_planes(k)}
    return {"rows": pp.gs_rows(k)}


def commit(coeffs, d: int, w: int | None, pp: pp_mod.PublicParams) -> Point:
    """C = Pedersen commit of the coefficient vector over GS[0..d+1]
    (pcdl.rs:99-110 -> pedersen.rs:6-20).  coeffs: (L, k) device array or
    list of ints, k <= d+1; implicit zero-padding to n = d+1 is free thanks
    to the MSM's zero-digit dump bucket."""
    n = d + 1
    assert n & (n - 1) == 0, "d+1 must be a power of two"
    assert n <= pp.n, "degree exceeds URS size"
    if isinstance(coeffs, list):
        if len(coeffs) <= 8:
            C = host_msm(coeffs, pp.gs_host(len(coeffs)))
            if w is not None:
                C = H.p_add(C, H.p_mul(w, pp.s))
            return C
        coeffs = FR.from_ints(coeffs)
    coeffs = _pad_pow2(coeffs, n)
    k = coeffs.shape[1]
    assert k <= n
    # pinned-pad MSM with the point AND the validity flag pulled in ONE
    # fetch (msm() costs two round trips: flag sync, then the point - at
    # ~25 ms each through the tunnel that doubles small-degree commit
    # latency); the astronomically-rare overflow falls back to measured.
    pt, ok = msm_mod.msm_flagged(pp.gs_points(k), coeffs, **_gs_tables(pp, k))
    C, okh = _point_and_flag_to_host(pt, ok)
    if not okh:
        C = point_to_host(msm_mod._msm_measured(pp.gs_points(k), coeffs))
    if w is not None:
        C = H.p_add(C, H.p_mul(w, pp.s))
    return C


def _rho0_points_scalars(*parts) -> int:
    return tr.rho_0(*parts)


def _pad_pow2(coeffs, n: int):
    """Zero-pad a (L, k) coefficient array so k is a power of two (<= n).

    Math no-op (top coefficients zero), but it bounds the set of shapes the
    jit cache ever sees to the lg(n) power-of-two classes: every XLA:CPU
    executable pins a few hundred mmap'd JIT sections for the life of the
    process, so per-degree specializations would exhaust vm.max_map_count
    in long sessions.  Zero digits route to the MSM dump bucket, so the
    padding is also nearly free at run time."""
    import jax.numpy as jnp

    k = coeffs.shape[1]
    t = 1
    while t < k:
        t *= 2
    t = min(t, n)
    if t > k:
        coeffs = jnp.concatenate([coeffs, FR.zeros((t - k,))], axis=1)
    return coeffs


def open_(
    rng: np.random.Generator,
    coeffs,
    C: Point,
    d: int,
    z: int,
    w: int | None,
    pp: pp_mod.PublicParams,
    _safe: bool = False,
    mesh=None,
    axis: str | None = None,
    v: int | None = None,
) -> EvalProof:
    """IPA opening proof (pcdl.rs:120-242).  v: optional p(z) when the
    caller already knows it (saves one device eval + ~25 ms fetch; the
    ASDL prover and the bench chain builder always do).

    coeffs: device (L, k) Fr coefficients of p (k-1 = deg p <= d), or host
    int list.  Hiding iff w is not None.

    The per-round L/R MSMs run with pinned pads and a DEFERRED validity
    flag (one extra fetch for the whole open instead of one sync per MSM);
    on the astronomically-rare pad overflow the proof is rebuilt through
    the measured path (_safe=True).

    mesh/axis: optional jax Mesh to shard the WIDTH-n fold vectors (gs, cs,
    zs) over devices - the "sequence parallel" analog of SURVEY.md section 2
    (the reference's scaling axis is degree d, folded in-core at
    pcdl.rs:195-227).  Fold arithmetic is elementwise (local per shard); the
    half-width rolls become collective permutes and the small c=5 L/R MSMs
    reduce across shards, all inserted by GSPMD from the input shardings.
    The proof bytes are bit-identical to the single-device path."""
    n = d + 1
    lg_n = n.bit_length() - 1
    assert n & (n - 1) == 0 and n <= pp.n
    if isinstance(coeffs, list):
        coeffs = FR.from_ints(coeffs)
    orig_coeffs = coeffs  # kept for the rare _safe retry (see below)
    coeffs = _pad_pow2(coeffs, n)
    k = coeffs.shape[1]

    zl = FR.from_ints([z])[:, 0]
    if v is None:
        # v := p(z)
        v = int(FR.to_ints(cached_jit(poly_mod.eval_poly, k)(coeffs, zl)))

    if w is not None:
        # p_bar = (X - z) * q with q uniform of degree deg(p) - 1
        qc = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(k - 1)]
        qdev = FR.from_ints(qc)
        p_bar = cached_jit(_mul_by_linear, k - 1)(qdev, zl)  # (L, k)
        w_bar = int.from_bytes(rng.bytes(40), "little") % F.R
        C_bar = commit(p_bar, d, w_bar, pp)
        a = tr.rho_0(ser.ser_point(C), ser.ser_scalar(z), ser.ser_scalar(v), ser.ser_point(C_bar))
        al = FR.from_ints([a])[:, 0]
        coeffs = cached_jit(_add_scaled, k, k)(coeffs, p_bar, al)
        w_prime = (w_bar * a + w) % F.R
        C_prime = H.p_add(H.p_add(C, H.p_mul(a, C_bar)), H.p_neg(H.p_mul(w_prime, pp.s)))
    else:
        C_bar, w_prime, C_prime = None, None, C

    xi = tr.rho_0(ser.ser_point(C_prime), ser.ser_scalar(z), ser.ser_scalar(v))
    H_prime = H.p_mul(xi, pp.h)

    # ---- the lg(n) fold rounds, EXPANSION-BASED (pcdl.rs:195-227) --------
    # The reference folds the GENERATORS every round (gs[j] += xi*gs[j+m],
    # pcdl.rs:218) - a per-point scalar mul, the prover's dominant cost.
    # Here the basis never folds: a width-n tensor-coefficient vector t
    # (t[j'] = product of the challenges selected by j's high bits - the
    # same structure as h(X)'s coefficients, pcdl.rs:486-509) tracks the
    # folded basis over the ORIGINAL affine URS, so
    #
    #     L_i = <c_hi, G^(i)_lo> = <t * c_hi_broadcast * lo_mask, G>
    #     R_i = <c_lo, G^(i)_hi> = <t * c_lo_broadcast * hi_mask, G>
    #
    # become FIXED-BASE MSMs with disjoint supports, which the sort-payload
    # pipeline computes as ONE dual-output pass per round (ops/msm.py
    # _sortrows_msm, nroute=2), and U = G^(lg n)[0] = <t_final, G> is one
    # final fixed-base MSM.  Point work per round: one MSM; the fold itself
    # is field-only (O(n) muls).  Every device step runs at static width n
    # with a TRACED half-width m, so the whole ladder reuses one compiled
    # shape set (per-round exact shapes were the round-2 compile killer).
    import jax.numpy as jnp

    cs = coeffs
    if cs.shape[1] < n:
        cs = jnp.concatenate([cs, FR.zeros((n - cs.shape[1],))], axis=1)
    zs = cached_jit(poly_mod.powers, n, static_argnums=1)(zl, n)
    t = FR.from_int(1, (n,))
    small = n <= 256  # the exact ladder MSM beats bucket machinery here
    use_sortrows = not small and not _safe and msm_mod._impl() == "sortrows"

    # Device-transcript fold: the whole lg(n) ladder (MSMs, normalization,
    # SHA3 challenges, folds) as ONE dispatch + ONE fetch - no per-round
    # host round-trips.  Requires the sortrows MSM and no mesh (the fused
    # fori's sort does not shard usefully).
    import os as _os

    if (
        use_sortrows
        and mesh is None
        and H_prime is not None
        and _os.environ.get("HALO_TPU_OPEN_DEVICE", "1") != "0"
    ):
        return _open_device(
            rng, orig_coeffs, cs, zs, C, d, z, w, pp, C_bar, w_prime, xi, H_prime
        )
    planes = pp.gs_planes(n) if (use_sortrows or not small) else None
    gs = pp.gs_points(n) if (small or not use_sortrows) else None

    if mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(mesh, PartitionSpec(None, axis or mesh.axis_names[0]))
        cs = jax.device_put(cs, sh)
        zs = jax.device_put(zs, sh)
        t = jax.device_put(t, sh)
        if planes is not None:
            planes = jax.device_put(planes, sh)
        if gs is not None:
            gs = cv.PointVec(*(jax.device_put(a, sh) for a in gs))

    Ls, Rs = [], []
    flags: list | None = None if _safe else []
    c_dual = msm_mod.window_size(max(n // 2, 1))
    pads_dual = msm_mod.pinned_pads(max(n // 2, 1), c_dual)
    beffs_dual = msm_mod._beffs(c_dual)
    pre = cached_jit(_open_round_pre, n)
    fold = cached_jit(_open_round_fold, n)
    m = n // 2
    while m >= 1:
        mm = jnp.int32(m)
        s_comb, route, dot_l, dot_r = pre(cs, zs, t, mm)
        if use_sortrows:
            (Lp, Rp), okv = msm_mod._sortrows_msm(
                planes, s_comb, c_dual, pads_dual, beffs_dual, route=route, nroute=2
            )
            flags.append(okv)
        else:
            eL, eR = cached_jit(_split_routes, n)(s_comb, route)
            if small:
                Lp = msm_mod.msm_ladder(gs, eL)
                Rp = msm_mod.msm_ladder(gs, eR)
            else:
                Lp = msm_mod.msm(gs, eL)
                Rp = msm_mod.msm(gs, eR)
        # ONE fetch for both points and both dot products (a tunnel round
        # trip costs ~25 ms and the lg(n) rounds are inherently sequential,
        # so per-round fetch count is the prover's latency floor)
        Lph, Rph, dl, dr = _fetch_round(Lp, Rp, dot_l, dot_r)
        Lh = H.p_add(Lph, H.p_mul(dl, H_prime))
        Rh = H.p_add(Rph, H.p_mul(dr, H_prime))
        Ls.append(Lh)
        Rs.append(Rh)
        xi_next = tr.rho_0(ser.ser_scalar(xi), ser.ser_point(Lh), ser.ser_point(Rh))
        xi = xi_next
        xi_inv = pow(xi_next, -1, F.R)
        cs, zs, t = fold(
            cs, zs, t, mm, FR.from_ints([xi_next])[:, 0], FR.from_ints([xi_inv])[:, 0]
        )
        m //= 2

    if flags:
        ok = bool(np.asarray(cached_jit(_all_flags)(jnp.stack(flags))))
        if not ok:
            # a pinned pad overflowed somewhere: rebuild the proof through
            # the measured MSM path (fresh prover randomness; same inputs)
            return open_(rng, orig_coeffs, C, d, z, w, pp, _safe=True, mesh=mesh, axis=axis)
    # U = G^(lg n)[0] = <t_final, G>: t_final IS h's coefficient vector
    if small:
        U = point_to_host(msm_mod.msm_ladder(gs, t))
    else:
        U = point_to_host(msm_mod.msm(pp.gs_points(n), t, planes=planes))
    c = int(FR.to_ints(cs[:, 0]))
    return EvalProof(Ls, Rs, U, c, C_bar, w_prime)


def _all_flags(fl):
    import jax.numpy as jnp

    return jnp.all(fl)


def _round_blob(Lp: cv.PointVec, Rp: cv.PointVec, dot_l, dot_r):
    import jax.numpy as jnp

    return jnp.concatenate(
        [Lp.x, Lp.y, Lp.z, Rp.x, Rp.y, Rp.z, dot_l, dot_r]
    )  # (8L,)


def _fetch_round(Lp: cv.PointVec, Rp: cv.PointVec, dot_l, dot_r):
    """Fetch one fold round's device outputs in a SINGLE (8L,) u32 pull:
    both L/R points (projective, lazy limbs) and both scalar dots."""
    import jax

    blob = np.asarray(jax.device_get(cached_jit(_round_blob)(Lp, Rp, dot_l, dot_r))).astype(object)

    def to_int(off):
        return sum(int(blob[off + i]) << (W * i) for i in range(L))

    def to_pt(off):
        xi, yi, zi = to_int(off), to_int(off + L), to_int(off + 2 * L)
        zi %= F.Q
        if zi == 0:
            return None
        zinv = pow(zi, -1, F.Q)
        return (xi * zinv % F.Q, yi * zinv % F.Q)

    return to_pt(0), to_pt(3 * L), to_int(6 * L) % F.R, to_int(7 * L) % F.R


def _open_round_pre(cs, zs, t, m):
    """Pre-fold quantities of one expansion-based IPA round at fixed width
    n, traced half-width m (current fold width w = 2m; cs/zs lanes >= w are
    zero, t is dense):

      s_comb[j] = t[j] * c[(j mod m) + m]  if (j & m) == 0   (L's scalars)
                  t[j] * c[j mod m]        otherwise         (R's scalars)
      route[j]  = (j & m) != 0             (which output the lane feeds)
      dot_l     = <c_hi, z_lo>,  dot_r = <c_lo, z_hi>

    The two supports are disjoint, so one dual-output MSM computes both
    L = <c_hi, G^(i)_lo> and R = <c_lo, G^(i)_hi> over the ORIGINAL basis."""
    import jax.numpy as jnp

    n = cs.shape[1]
    i = jnp.arange(n, dtype=jnp.int32)
    jm = i & (m - 1)  # j mod m (m is a power of two)
    lo = (i & m) == 0  # (j mod 2m) < m
    c_lo_b = jnp.take(cs, jm, axis=1)
    c_hi_b = jnp.take(cs, jm + m, axis=1)
    s_comb = FR.mul(t, jnp.where(lo[None], c_hi_b, c_lo_b))
    route = (~lo).astype(jnp.int32)
    mask = (i < m)[None, :]
    zero = FR.zeros((n,))
    ip = jnp.minimum(i + m, n - 1)
    c_hi = jnp.where(mask, jnp.take(cs, ip, axis=1), zero)
    z_hi = jnp.where(mask, jnp.take(zs, ip, axis=1), zero)
    dot_l = FR.sum_along(FR.mul(c_hi, zs), 0)
    dot_r = FR.sum_along(FR.mul(jnp.where(mask, cs, zero), z_hi), 0)
    return s_comb, route, dot_l, dot_r


def _open_round_fold(cs, zs, t, m, xi, xi_inv):
    """Fold the coefficient/power vectors with the round challenge
    (pcdl.rs:216-224) and absorb xi into the tensor-coefficient vector t at
    bit position lg(m) - field-only, no point work.  Fixed width, traced m;
    lanes >= m of cs/zs are zeroed."""
    import jax.numpy as jnp

    n = cs.shape[1]
    i = jnp.arange(n, dtype=jnp.int32)
    mask = (i < m)[None, :]
    zero = FR.zeros((n,))
    ip = jnp.minimum(i + m, n - 1)
    c_hi = jnp.take(cs, ip, axis=1)
    z_hi = jnp.take(zs, ip, axis=1)
    c_new = jnp.where(mask, FR.add(cs, poly_mod.scale(c_hi, xi_inv)), zero)
    z_new = jnp.where(mask, FR.add(zs, poly_mod.scale(z_hi, xi)), zero)
    hi_bit = ((i & m) != 0)[None, :]
    t_new = jnp.where(hi_bit, poly_mod.scale(t, xi), t)
    return c_new, z_new, t_new


def _split_routes(s_comb, route):
    """Dual-MSM scalars -> two masked width-n vectors (ladder/measured
    fallback paths, where the MSM has no route support)."""
    import jax.numpy as jnp

    zero = FR.zeros((s_comb.shape[1],))
    lo = (route == 0)[None, :]
    return jnp.where(lo, s_comb, zero), jnp.where(lo, zero, s_comb)


def _open_device(rng, orig_coeffs, cs, zs, C, d, z, w, pp, C_bar, w_prime, xi0_int, H_prime):
    """open_'s device-transcript path: one fused dispatch for the whole
    fold (see _open_fold_device) + one result fetch; falls back to the
    measured host-hashed path on the astronomically-rare pad overflow.
    Proof bytes are bit-identical to the host-transcript path
    (tests/test_pcdl.py::test_open_device_matches_host)."""
    import jax
    import jax.numpy as jnp

    from halo_accumulation_tpu.ops import msm as msm_mod

    n = d + 1
    lg_n = n.bit_length() - 1
    planes = pp.gs_planes(n)
    # H' rides as two extra basis columns (scalars: the per-round dot
    # products, one per route), plus zero pads to keep N % 8 == 0
    hx = FQ.from_ints([H_prime[0], H_prime[0]])
    hy = FQ.from_ints([H_prime[1], H_prime[1]])
    ext = msm_mod.planes_from_affine(hx, hy)  # (L, 2) packed
    zeros6 = jnp.zeros((L, 6), jnp.uint32)
    planes_ext = cached_jit(
        lambda p, e, z6: jnp.concatenate([p, e, z6], axis=1), "pex", n
    )(planes, ext, zeros6)
    xi_dev = FR.from_ints([xi0_int])[:, 0]
    segs = []  # per-segment (Lx, Ly, Li, Rx, Ry, Ri)
    oks = []
    # NOTE: Wc, not W - the module-level W is the LIMB width used by
    # to_int below; shadowing it with the segment width corrupted every
    # host-parsed proof coordinate (the round-5 collapse bug)
    Wc = n
    rounds_left = lg_n
    # collapse segments: 4 rounds then fold the basis by 16, so later
    # rounds run at 1/16 width (see _open_fold_device); all segments chain
    # on device - ONE result fetch at the very end
    while Wc >= _COLLAPSE_MIN and rounds_left > 4:
        cw = msm_mod.window_size(max(Wc // 2, 1))
        pw = tuple(msm_mod.pinned_pads(max(Wc // 2, 1), cw))
        bw = tuple(msm_mod._beffs(cw))
        out = cached_jit(
            _open_fold_device, "ofd4", Wc, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11),
        )(planes_ext, cs, zs, xi_dev, 4, cw, pw, bw, 0, (), (), False)
        segs.append(out[:6])
        planes_ext, cs, zs, xi_dev, okv = out[6:]
        oks.append(okv)
        Wc //= 16
        rounds_left -= 4
    cw = msm_mod.window_size(max(Wc // 2, 1))
    pw = tuple(msm_mod.pinned_pads(max(Wc // 2, 1), cw))
    bw = tuple(msm_mod._beffs(cw))
    cU2 = msm_mod.window_size(Wc)
    padsU2 = tuple(msm_mod.pinned_pads(Wc, cU2))
    beffsU2 = tuple(msm_mod._beffs(cU2))
    out = cached_jit(
        _open_fold_device, "ofdF", Wc, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11),
    )(planes_ext, cs, zs, xi_dev, rounds_left, cw, pw, bw, cU2, padsU2, beffsU2, True)
    segs.append(out[:6])
    host = jax.device_get((segs, out[6:], oks))  # ONE fetch for everything
    segs_h, (Uax, Uay, Uinf, c0, okF), oks_h = host
    Lx = np.concatenate([s[0] for s in segs_h])
    Ly = np.concatenate([s[1] for s in segs_h])
    Li = np.concatenate([s[2] for s in segs_h])
    Rx = np.concatenate([s[3] for s in segs_h])
    Ry = np.concatenate([s[4] for s in segs_h])
    Ri = np.concatenate([s[5] for s in segs_h])
    ok = bool(okF) and all(bool(o) for o in oks_h)
    if not ok:
        # a pinned pad overflowed somewhere (or a collapse combination hit
        # the identity): rebuild through the measured host path (fresh
        # prover randomness; same inputs)
        return open_(rng, orig_coeffs, C, d, z, w, pp, _safe=True)

    def to_int(limbs) -> int:
        return sum(int(v) << (W * k) for k, v in enumerate(limbs))

    def to_pt(xl, yl, infl) -> Point:
        return None if bool(infl) else (to_int(xl), to_int(yl))

    Ls = [to_pt(Lx[i], Ly[i], Li[i]) for i in range(lg_n)]
    Rs = [to_pt(Rx[i], Ry[i], Ri[i]) for i in range(lg_n)]
    U = to_pt(Uax, Uay, Uinf)
    return EvalProof(Ls, Rs, U, to_int(c0), C_bar, w_prime)


def _ser_point_words(ax, ay, inf):
    """Device ser_point pieces: (8 u32 x-words with x=0 at infinity, flag
    byte u32) matching utils/serialize.ser_point bit-for-bit."""
    import jax.numpy as jnp

    from halo_accumulation_tpu.ops import keccak as kk

    x = jnp.where(inf, jnp.uint32(0), ax)
    xw = kk.limbs_to_words(x)
    gt = kk.limbs_gt_const(ay, (F.Q - 1) // 2)  # y > Q - y  <=>  y > (Q-1)/2
    flag = jnp.where(
        inf, jnp.uint32(ser.SW_INFINITY), jnp.where(gt, jnp.uint32(ser.SW_Y_NEG), jnp.uint32(0))
    )
    return xw, flag


def _rho_round_device(xi, Lax, Lay, Linf, Rax, Ray, Rinf):
    """Device xi_{i+1} = rho_0(xi_i, L, R) (pcdl.rs:212): assemble the
    98-byte ark-serialize message + 4-byte tag and hash on device."""
    import numpy as _onp

    from halo_accumulation_tpu.ops import keccak as kk

    msg = [_onp.uint32(0)] * 27  # ceil(102/4) + spill room = 26+1
    msg = kk.emit_bytes(msg, 0, kk.limbs_to_words(xi), 32)
    Lxw, Lflag = _ser_point_words(Lax, Lay, Linf)
    msg = kk.emit_bytes(msg, 32, Lxw, 32)
    msg[16] = msg[16] | Lflag  # flag byte at offset 64
    Rxw, Rflag = _ser_point_words(Rax, Ray, Rinf)
    msg = kk.emit_bytes(msg, 65, Rxw, 32)
    msg[24] = msg[24] | (Rflag << _onp.uint32(8))  # flag byte at offset 97
    # bytes 98..101 are the appended rho_0 tag (0u32 LE) = zeros
    dig = kk.sha3_256_words(msg, 102)
    return kk.mod_r_256(kk.words_to_limbs(dig))


_COLLAPSE_MIN = 2048  # collapse segments while width >= this (W/16 >= 128)


def _open_fold_device(
    planes_ext,
    cs,
    zs,
    xi0,
    k: int,
    c_dual: int,
    pads_dual: tuple,
    beffs_dual: tuple,
    cU: int,
    padsU: tuple,
    beffsU: tuple,
    finalize: bool,
):
    """k IPA fold rounds as one traced graph: per round one dual-output
    fixed-base MSM (H' rides as two extra basis columns with the <c,z> dot
    products as scalars, so L/R come out complete), on-device batch
    normalization, on-device Fiat-Shamir (ops/keccak.py), Fermat inversion
    of the challenge, and the field-only fold.  No host round-trips: the
    lg(n) * ~25 ms tunnel-fetch floor of the host-hashed path disappears.

    finalize=False (a COLLAPSE segment, k=4): afterwards the basis is
    folded by 16 with the segment's tensor coefficients (msm.fold_basis),
    so the next segment runs at 1/16 width - the expansion prover's answer
    to the reference's per-round generator fold.  Returns
    (L/R stacks, planes_ext', cs', zs', xi', ok).

    finalize=True: runs all k remaining rounds at this width and computes
    U = <t_final, basis>.  Returns (L/R stacks, U affine, c0, ok)."""
    import jax
    import jax.numpy as jnp

    from halo_accumulation_tpu.ops import msm as msm_mod

    Wf = cs.shape[1]  # segment width (NOT the limb width W)
    t0 = FR.from_int(1, (Wf,))
    Z = jnp.zeros((k, L), jnp.uint32)
    Zb = jnp.zeros((k,), jnp.bool_)
    ok0 = jnp.bool_(True)

    def body(i, st):
        cs, zs, t, xi, Lx, Ly, Li, Rx, Ry, Ri, ok = st
        m = jnp.int32(Wf) >> (i + 1)
        s_comb, route, dot_l, dot_r = _open_round_pre(cs, zs, t, m)
        s_ext = jnp.concatenate([s_comb, dot_l[:, None], dot_r[:, None], FR.zeros((6,))], axis=1)
        route_ext = jnp.concatenate(
            [route, jnp.asarray([0, 1, 0, 0, 0, 0, 0, 0], jnp.int32)]
        )
        (Lp, Rp), okv = msm_mod._sortrows_msm(
            planes_ext, s_ext, c_dual, list(pads_dual), list(beffs_dual),
            route=route_ext, nroute=2,
        )
        both = cv.PointVec(
            jnp.stack([Lp.x, Rp.x], axis=1),
            jnp.stack([Lp.y, Rp.y], axis=1),
            jnp.stack([Lp.z, Rp.z], axis=1),
        )
        ax, ay, inf = cv.to_affine(both)
        xi_next = _rho_round_device(
            xi, ax[:, 0], ay[:, 0], inf[0], ax[:, 1], ay[:, 1], inf[1]
        )
        xi_inv = FR.inv(xi_next)
        cs, zs, t = _open_round_fold(cs, zs, t, m, xi_next, xi_inv)
        Lx = Lx.at[i].set(ax[:, 0])
        Ly = Ly.at[i].set(ay[:, 0])
        Li = Li.at[i].set(inf[0])
        Rx = Rx.at[i].set(ax[:, 1])
        Ry = Ry.at[i].set(ay[:, 1])
        Ri = Ri.at[i].set(inf[1])
        return (cs, zs, t, xi_next, Lx, Ly, Li, Rx, Ry, Ri, ok & okv)

    st = (cs, zs, t0, xi0, Z, Z, Zb, Z, Z, Zb, ok0)
    cs, zs, t, xi, Lx, Ly, Li, Rx, Ry, Ri, ok = jax.lax.fori_loop(0, k, body, st)
    outs = (Lx, Ly, Li, Rx, Ry, Ri)
    if finalize:
        t_ext = jnp.concatenate([t, FR.zeros((8,))], axis=1)
        (Up,), okU = msm_mod._sortrows_msm(planes_ext, t_ext, cU, list(padsU), list(beffsU))
        Usingle = cv.PointVec(Up.x[:, None], Up.y[:, None], Up.z[:, None])
        Uax, Uay, Uinf = cv.to_affine(Usingle)
        c0 = FR.canon(cs[:, 0])
        return outs + (Uax[:, 0], Uay[:, 0], Uinf[0], c0, ok & okU)
    # collapse: fold the basis by 16 with the segment's tensor coefficients
    w2 = Wf // 16
    t16 = t.reshape(L, 16, w2)[:, :, 0]  # tc_h = t[h * w2] (shared per block)
    basis2, any_inf = msm_mod.fold_basis(planes_ext[:, :Wf], t16)
    planes2 = jnp.concatenate([basis2, planes_ext[:, Wf:]], axis=1)
    cs2 = cs[:, :w2]
    zs2 = zs[:, :w2]
    return outs + (planes2, cs2, zs2, xi, ok & ~any_inf)


def _mul_by_linear(q, zl):
    """(X - z) * q(X) given q coeffs (L, k): result (L, k+1)."""
    import jax.numpy as jnp

    zero = FR.zeros((1,))
    shifted = jnp.concatenate([zero, q], axis=1)  # X * q
    scaled = jnp.concatenate([poly_mod.scale(q, zl), zero], axis=1)  # z * q
    return FR.sub(shifted, scaled)


def _add_scaled(a, b, s):
    """a + s*b for coeff arrays of equal length."""
    return FR.add(a, poly_mod.scale(b, s))


def succinct_check_parts(C: Point, d: int, z: int, v: int, pi: EvalProof, pp: pp_mod.PublicParams):
    """Host transcript replay of succinct_check (pcdl.rs:252-314).

    All challenges depend only on (C, z, v, proof), so the entire transcript
    is replayed on the host and the group-equation check is RETURNED as an
    MSM row (points, scalars) that must evaluate to the identity:

        C' + (v - v')*xi_0*H + sum(xi^-1 L + xi R) - c*U == 0

    This restructuring (vs the Rust's interleaved hash/point loop) is what
    lets many checks batch into one device call."""
    n = d + 1
    lg_n = n.bit_length() - 1
    if n & (n - 1):
        raise ValueError("d+1 is not a power of 2")
    if len(pi.Ls) != lg_n or len(pi.Rs) != lg_n:
        raise ValueError("proof length mismatch")

    if pi.C_bar is not None:
        a = tr.rho_0(
            ser.ser_point(C), ser.ser_scalar(z), ser.ser_scalar(v), ser.ser_point(pi.C_bar)
        )
        C_prime = H.p_add(H.p_add(C, H.p_mul(a, pi.C_bar)), H.p_neg(H.p_mul(pi.w_prime, pp.s)))
    else:
        C_prime = C

    xi_0 = tr.rho_0(ser.ser_point(C_prime), ser.ser_scalar(z), ser.ser_scalar(v))
    xis = [xi_0]
    for i in range(lg_n):
        xis.append(tr.rho_0(ser.ser_scalar(xis[i]), ser.ser_point(pi.Ls[i]), ser.ser_point(pi.Rs[i])))

    h = HPoly(xis)
    v_prime = pi.c * h.eval(z) % F.R

    pts = [C_prime, pp.h] + pi.Ls + pi.Rs + [pi.U]
    scs = [1, (v - v_prime) * xi_0 % F.R]
    inv_all = _batch_inv_host([xis[i + 1] for i in range(lg_n)])
    scs.extend(inv_all)
    scs.extend(xis[i + 1] for i in range(lg_n))
    scs.append((-pi.c) % F.R)
    return h, pts, scs


def _batch_inv_host(vals):
    """Montgomery-trick batch inversion on host ints."""
    if not vals:
        return []
    pref = [1]
    for v in vals:
        pref.append(pref[-1] * v % F.R)
    inv = pow(pref[-1], -1, F.R)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        out[i] = pref[i] * inv % F.R
        inv = inv * vals[i] % F.R
    return out


def succinct_check(C: Point, d: int, z: int, v: int, pi: EvalProof, pp: pp_mod.PublicParams):
    """O(lg d) proof check: single-proof wrapper over the batched path.
    Returns (HPoly, U) or raises ValueError."""
    (res,) = succinct_check_batch([(C, d, z, v, pi)], pp)
    return res


def succinct_check_batch_device(checks, pp: pp_mod.PublicParams, mesh=None, axis: str | None = None):
    """Host transcript replays + ONE batched device row-MSM dispatch,
    WITHOUT fetching the verdict (the tunnel round trip is ~30 ms; callers
    combine the ok vector with other device checks into a single sync).

    Returns (parts, ok_device) where parts[b] = (HPoly, pts, scs) and
    ok_device is a (B',) device bool vector (B' >= len(checks); padding
    rows are all-identity and trivially true)."""
    parts = [succinct_check_parts(C, d, z, v, pi, pp) for (C, d, z, v, pi) in checks]
    M = max(len(p[1]) for p in parts)
    # pad the batch axis to a power of two (and a mesh multiple) with
    # all-identity rows (which trivially pass) so the jit cache sees
    # lg-bounded shape classes
    B = 1
    while B < len(parts):
        B *= 2
    if mesh is not None:
        nd = mesh.devices.size
        B = nd * ((B + nd - 1) // nd)
    pts_rows, scs_rows = [], []
    for _, pts, scs in parts:
        pad = M - len(pts)
        pts_rows.append(pts + [None] * pad)
        scs_rows.append(scs + [0] * pad)
    for _ in range(B - len(parts)):
        pts_rows.append([None] * M)
        scs_rows.append([0] * M)
    P = cv.from_affine_ints([p for row in pts_rows for p in row])
    P = cv.PointVec(*(a.reshape(L, B, M) for a in P))
    s = FR.from_ints([x for row in scs_rows for x in row]).reshape(L, B, M)
    if mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(mesh, PartitionSpec(None, axis, None))
        P = cv.PointVec(*(jax.device_put(a, sh) for a in P))
        s = jax.device_put(s, sh)
    R = cached_jit(_rows_and_isinf, B, M)(P, s)
    return parts, R


def succinct_check_batch(checks, pp: pp_mod.PublicParams, mesh=None, axis: str | None = None):
    """Verify many succinct checks in ONE device call.

    checks: list of (C, d, z, v, pi) with equal d.  Returns [(HPoly, U)];
    raises ValueError (with the failing index) if any check rejects.

    mesh/axis: optional jax Mesh + axis name to shard the instance-batch
    axis across devices (the "data parallel" analog, SURVEY.md section 2:
    the reference's serial `for q in qs` loop at acc.rs:158-166).  Rows are
    independent, so GSPMD runs the batched row-MSM with zero collectives."""
    parts, R = succinct_check_batch_device(checks, pp, mesh, axis)
    ok = np.asarray(R)
    for b in range(len(parts)):
        if not ok[b]:
            raise ValueError(f"C_(log_n) != CM.Commit_Sigma(c || v') (batch index {b})")
    return [(p[0], checks[b][4].U) for b, p in enumerate(parts)]


def _rows_and_isinf(P, s):
    R = msm_mod.msm_rows(P, s)
    return cv.is_identity(R)


def commit_device(coeffs, d: int, pp: pp_mod.PublicParams):
    """Non-hiding commit staying ON DEVICE: returns (point, ok_flag) where
    ok_flag is the pinned-pad validity bool (see msm_flagged).  No host
    sync: latency-critical verify paths combine flags into one fetch."""
    n = d + 1
    assert n & (n - 1) == 0 and n <= pp.n
    coeffs = _pad_pow2(coeffs, n)
    k = coeffs.shape[1]
    return msm_mod.msm_flagged(pp.gs_points(k), coeffs, **_gs_tables(pp, k))


def check_device(
    C: Point,
    d: int,
    z: int,
    v: int,
    pi: EvalProof,
    pp: pp_mod.PublicParams,
    mesh=None,
    axis: str | None = None,
):
    """Full check (pcdl.rs:323-342) with the verdict left ON DEVICE: one
    bool combining the succinct row equation, the deferred
    U == Commit(h coeffs) equality, and the pinned-pad validity flag.
    mesh/axis: optional Mesh to shard the deferred n-point MSM over devices
    (parallel/msm_sharded).  Raises ValueError on host-checkable
    malformations (proof length)."""
    import jax.numpy as jnp

    h, pts, scs = succinct_check_parts(C, d, z, v, pi, pp)
    M = len(pts)
    P = cv.from_affine_ints(pts)
    P = cv.PointVec(*(a.reshape(L, 1, M) for a in P))
    s = FR.from_ints(scs).reshape(L, 1, M)
    ok_row = cached_jit(_rows_and_isinf, 1, M)(P, s)[0]
    hc = cached_jit(_h_coeffs, len(h.xis))(FR.from_ints(h.xis))
    if mesh is not None and (d + 1) % mesh.devices.size == 0:
        from halo_accumulation_tpu.parallel import msm_sharded as sh

        n = d + 1
        hc = _pad_pow2(hc, n)
        k = max(hc.shape[1], mesh.devices.size)
        hc = jnp.concatenate([hc, FR.zeros((k - hc.shape[1],))], axis=1) if hc.shape[1] < k else hc
        comm = sh.msm_sharded(sh.shard_points(pp.gs_points(k), mesh), hc, mesh)
        flag = jnp.asarray(True)
    else:
        comm, flag = commit_device(hc, d, pp)
    Uv = cv.from_affine_ints([pi.U])
    U_single = cv.PointVec(Uv.x[:, 0], Uv.y[:, 0], Uv.z[:, 0])
    ok_eq = cached_jit(cv.peq)(comm, U_single)
    return ok_row & ok_eq & flag


def check(C: Point, d: int, z: int, v: int, pi: EvalProof, pp: pp_mod.PublicParams):
    """Full check (pcdl.rs:323-342): succinct check + the deferred n-MSM
    U == Commit(h coefficients).  Fast path: one device dispatch chain +
    ONE fetch; on failure, re-verifies through the measured-pad path to
    rule out a pinned-pad overflow before rejecting."""
    ok = check_device(C, d, z, v, pi, pp)
    if bool(np.asarray(ok)):
        return
    h, U = succinct_check(C, d, z, v, pi, pp)  # raises if the row check fails
    hc = cached_jit(_h_coeffs, len(h.xis))(FR.from_ints(h.xis))
    comm = commit(hc, d, None, pp)
    if comm != U:
        raise ValueError("U != CM.Commit(ck, h_vec)")


def _h_coeffs(xis_arr):
    return poly_mod.tensor_h_coeffs(xis_arr)
