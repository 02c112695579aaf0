"""ASDL: accumulation scheme for PCDL (BCMS 2020), host-orchestrated.

Functional mirror of /root/reference/code/src/acc.rs: common_subroutine
(:135), prover (:190), verifier (:223), decider (:245), with the same
Fiat-Shamir quirks:

  * alpha = rho_1(AccumulatedHPolys) hashes the struct with alpha=None and
    alphas=[] at hash time (acc.rs:147-173) - both fields are serialized
    (as a 0x00 option tag and a 0-length vec) even though unset.
  * z = rho_1(C, alpha) hashes alpha itself, not h(X) (acc.rs:181; the
    report's spec says h - the code wins).

Device work: succinct checks (via pcdl), the dense h(X) expansion (tensor
product), and every MSM.  Host work: hashes, challenge arithmetic, the
tiny (m+1)-point accumulated commitment.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from halo_accumulation_tpu import fields as F
from halo_accumulation_tpu import hostops as H
from halo_accumulation_tpu import pcdl
from halo_accumulation_tpu import pp as pp_mod
from halo_accumulation_tpu.ops import poly as poly_mod
from halo_accumulation_tpu.ops.field import FR
from halo_accumulation_tpu.runtime import cached_jit
from halo_accumulation_tpu.utils import serialize as ser
from halo_accumulation_tpu.utils import transcript as tr


@dataclass
class Instance:
    """q in the paper (acc.rs:21-28)."""

    C: pcdl.Point
    d: int
    z: int
    v: int
    pi: pcdl.EvalProof

    def serialize(self) -> bytes:
        return (
            ser.ser_point(self.C)
            + ser.ser_u64(self.d)
            + ser.ser_scalar(self.z)
            + ser.ser_scalar(self.v)
            + self.pi.serialize()
        )


@dataclass
class AccumulatorHiding:
    """pi_V = (h_0, U_0, omega) (acc.rs:54-59)."""

    h: list  # degree-1 poly coefficients [b, a] as ints
    U: pcdl.Point
    w: int


@dataclass
class Accumulator:
    """acc = ((C_bar, d, z, v), pi) + pi_V (acc.rs:43-51)."""

    C_bar: pcdl.Point
    d: int
    z: int
    v: int
    pi: pcdl.EvalProof
    pi_V: AccumulatorHiding

    def to_instance(self) -> Instance:
        """IVC chaining coercion (acc.rs:121-131)."""
        return Instance(self.C_bar, self.d, self.z, self.v, self.pi)


class AccumulatedHPolys:
    """h_0 + sum alpha^(i+1) h_i bookkeeping (acc.rs:61-107)."""

    def __init__(self, m: int):
        self.h_0: list | None = None  # coefficients (ints)
        self.hs: list[pcdl.HPoly] = []
        self.alpha: int | None = None
        self.alphas: list[int] = []
        self._cap = m + 1

    def set_alpha(self, alpha: int):
        self.alpha = alpha
        a, cur = [], 1
        for _ in range(self._cap):
            a.append(cur)
            cur = cur * alpha % F.R
        self.alphas = a

    def serialize_for_alpha(self) -> bytes:
        """Struct serialization at hash time: alpha=None, alphas=[]
        (acc.rs:173 with state from :147-166)."""
        out = ser.ser_option(ser.ser_poly(self.h_0) if self.h_0 is not None else None)
        out += ser.ser_vec([h.serialize() for h in self.hs])
        out += ser.ser_option(None)  # alpha
        out += ser.ser_vec([])  # alphas
        return out

    def eval(self, z: int) -> int:
        v = 0
        if self.h_0 is not None:
            zp, acc = 1, 0
            for c in self.h_0:
                acc = (acc + c * zp) % F.R
                zp = zp * z % F.R
            v = acc
        for i, h in enumerate(self.hs):
            v = (v + h.eval(z) * self.alphas[i + 1]) % F.R
        return v

    def coeffs_device(self, n: int):
        """Dense coefficients of the combined polynomial, (L, n) device."""
        import jax.numpy as jnp

        acc = FR.from_ints(self.h_0 if self.h_0 is not None else [0])
        if acc.shape[1] < n:
            acc = jnp.concatenate([acc, FR.zeros((n - acc.shape[1],))], axis=1)
        for i, h in enumerate(self.hs):
            xis = FR.from_ints(h.xis)
            al = FR.from_ints([self.alphas[i + 1]])[:, 0]
            acc = cached_jit(_acc_h, len(h.xis), n)(acc, xis, al)
        return acc


def _acc_h(acc, xis, al):
    hc = poly_mod.tensor_h_coeffs(xis)
    return poly_mod.add(acc, poly_mod.scale(hc, al))


def common_subroutine(
    d: int, qs: list[Instance], pi_V: AccumulatorHiding, pp: pp_mod.PublicParams
):
    """T^rho(avk, qs, pi_V) (acc.rs:135-188).
    Returns (C_bar, d, z, AccumulatedHPolys)."""
    m = len(qs)
    hs = AccumulatedHPolys(m)
    Us: list[pcdl.Point] = []

    hs.h_0 = list(pi_V.h)
    Us.append(pi_V.U)

    # U_0 must be a deterministic commitment to h_0 (acc.rs:152-155);
    # h_0 is degree 1, so the padded commit reduces to a 2-point MSM.
    if pcdl.commit(list(pi_V.h), d, None, pp) != pi_V.U:
        raise ValueError("U_0 != PCDL.Commit(h_0)")

    # ONE batched device call for all m succinct checks (the reference
    # loops them serially, acc.rs:158-166; a per-q call costs a ~25 ms
    # verdict fetch each through the TPU tunnel)
    for q in qs:
        if q.d != d:
            raise ValueError("d_i != d")
    for (h_i, U_i), q in zip(
        pcdl.succinct_check_batch([(q.C, q.d, q.z, q.v, q.pi) for q in qs], pp), qs
    ):
        hs.hs.append(h_i)
        Us.append(U_i)

    hs.set_alpha(tr.rho_1(hs.serialize_for_alpha()))

    # C := <alphas, Us>  ((m+1)-point MSM, tiny -> host oracle)
    C = pcdl.host_msm(hs.alphas[: m + 1], Us)

    z = tr.rho_1(ser.ser_point(C), ser.ser_scalar(hs.alpha))

    C_bar = H.p_add(C, H.p_mul(pi_V.w, pp.s))
    return C_bar, d, z, hs


def prover(
    rng: np.random.Generator, d: int, qs: list[Instance], pp: pp_mod.PublicParams
) -> Accumulator:
    """Accumulation prover (acc.rs:190-220)."""
    h_0 = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(2)]
    U_0 = pcdl.commit(h_0, d, None, pp)
    w = int.from_bytes(rng.bytes(40), "little") % F.R
    pi_V = AccumulatorHiding(h=h_0, U=U_0, w=w)

    C_bar, d, z, hs = common_subroutine(d, qs, pi_V, pp)
    v = hs.eval(z)
    pi = pcdl.open_(rng, hs.coeffs_device(d + 1), C_bar, d, z, w, pp, v=v)
    return Accumulator(C_bar=C_bar, d=d, z=z, v=v, pi=pi, pi_V=pi_V)


def verifier(D: int, qs: list[Instance], acc: Accumulator, pp: pp_mod.PublicParams):
    """Accumulation verifier (acc.rs:223-243).  Raises on reject."""
    C_bar_p, d_p, z_p, hs = common_subroutine(D, qs, acc.pi_V, pp)
    if C_bar_p != acc.C_bar:
        raise ValueError("C_bar' != C_bar")
    if z_p != acc.z:
        raise ValueError("z' != z")
    if d_p != acc.d:
        raise ValueError("d' != d")
    if hs.eval(acc.z) != acc.v:
        raise ValueError("h(z) != v")


def decider(acc: Accumulator, pp: pp_mod.PublicParams):
    """Decider (acc.rs:245-255): one full PCDL check validates the chain."""
    pcdl.check(acc.C_bar, acc.d, acc.z, acc.v, acc.pi, pp)


def _stack_flags(oks):
    import jax.numpy as jnp

    return jnp.stack(oks)


def _verify_chain_fused(
    Ps, ss, Pu, su, Pd, sd, xis1, Uv, planes, n: int, c: int, pads: tuple, beffs: tuple
):
    """The entire fast-path verdict in ONE traced graph: batched succinct
    rows, batched U_0 rows, and the final decider (row check + deferred
    n-MSM + U equality).  Returns a (Bs + B + 1,) bool vector laid out
    [succinct rows | U_0 rows | decider]."""
    import jax.numpy as jnp

    ok_succ = pcdl._rows_and_isinf(Ps, ss)
    ok_u0 = pcdl._rows_and_isinf(Pu, su)
    ok_dec = _deciders_fused(Pd, sd, xis1, Uv, planes, n, c, pads, beffs)  # (1,)
    return jnp.concatenate([ok_succ, ok_u0, ok_dec])


def _deciders_fused(Pd, sd, xis_stack, Uv, planes, n: int, c: int, pads: tuple, beffs: tuple):
    """K full PCDL checks (pcdl.rs:323-342) in ONE traced graph: batched
    succinct row-MSM + K deferred n-MSMs through msm_many_flagged + batched
    U equality.  Returns (K,) bool."""
    import jax
    import jax.numpy as jnp

    from halo_accumulation_tpu.ops import curve as cv, msm as msm_mod
    from halo_accumulation_tpu.ops import poly as poly_mod
    from halo_accumulation_tpu.ops.field import FQ

    ok_rows = pcdl._rows_and_isinf(Pd, sd)  # (K,)
    hcs = jax.vmap(poly_mod.tensor_h_coeffs)(xis_stack)  # (K, L, n)
    K = hcs.shape[0]
    if n >= msm_mod._SORTROWS_MIN:
        comm, flag = msm_mod.msm_many_flagged(planes, hcs, c, list(pads), list(beffs))
    else:
        # tiny degrees: the batched exact ladder (no pads, always valid)
        gx, gy = msm_mod.unpack_affine_planes(planes)
        Lc = gx.shape[0]
        pts = cv.PointVec(
            jnp.broadcast_to(gx[:, None], (Lc, K, n)),
            jnp.broadcast_to(gy[:, None], (Lc, K, n)),
            FQ.from_int(1, (K, n)),
        )
        comm = msm_mod.msm_rows(pts, jnp.moveaxis(hcs, 0, 1))
        flag = jnp.asarray(True)
    ok_eq = cv.peq(comm, Uv)  # (K,)
    return ok_rows & ok_eq & flag


def decide_many(accs: list[Accumulator], pp: pp_mod.PublicParams):
    """Run the decider for EVERY accumulator as ONE fused device dispatch +
    ONE verdict fetch (the reference's slow helper runs k sequential full
    checks, benches/acc.rs:100-106).  Verdicts and rejection behavior are
    identical to calling decider() per step; on a False verdict the
    per-step decider re-verifies through the measured MSM path before
    rejecting (ruling out a pinned-pad overflow, see pcdl.check)."""
    if not accs:
        return
    from halo_accumulation_tpu.ops import msm as msm_mod

    same_d = all(a.d == accs[0].d for a in accs)
    if msm_mod._impl() != "sortrows" or not same_d:
        oks = [pcdl.check_device(a.C_bar, a.d, a.z, a.v, a.pi, pp) for a in accs]
        combined = np.asarray(cached_jit(_stack_flags, len(oks))(oks))
    else:
        combined = np.asarray(_decide_many_device(accs, pp))
    for i, ok in enumerate(combined):
        if not ok:
            decider(accs[i], pp)  # raises with the precise failure


def _decide_many_device(accs: list[Accumulator], pp: pp_mod.PublicParams):
    """Host transcript replays + one fused device call; returns (K,) bool
    device array.  Chunks the batch to bound the traced graph size."""
    import jax.numpy as jnp

    from halo_accumulation_tpu.ops import curve as cv, msm as msm_mod
    from halo_accumulation_tpu.ops.field import L as _L

    n = accs[0].d + 1
    c = msm_mod.window_size(n)
    pads = tuple(msm_mod.pinned_pads(n, c))
    beffs = tuple(msm_mod._beffs(c))
    planes = pp.gs_planes(n)
    out = []
    # CH = 1: every chunk reuses ONE compiled (n, K=1, M) graph across all
    # K accumulators (dispatches pipeline; the verdicts still combine into
    # one fetch).  Larger chunks would put K copies of the deferred-MSM
    # sort in one graph - sort compile time is the binding constraint on
    # this toolchain (~85 s per 19-operand sort shape).
    CH = 1
    for lo in range(0, len(accs), CH):
        part = accs[lo : lo + CH]
        parts = [
            pcdl.succinct_check_parts(a.C_bar, a.d, a.z, a.v, a.pi, pp) for a in part
        ]
        K = len(part)
        M = max(len(p[1]) for p in parts)
        pts_rows = [p[1] + [None] * (M - len(p[1])) for p in parts]
        scs_rows = [p[2] + [0] * (M - len(p[2])) for p in parts]
        P = cv.from_affine_ints([q for row in pts_rows for q in row])
        P = cv.PointVec(*(a.reshape(_L, K, M) for a in P))
        s = FR.from_ints([x for row in scs_rows for x in row]).reshape(_L, K, M)
        xis_stack = jnp.stack([FR.from_ints(p[0].xis) for p in parts])
        Uv = cv.from_affine_ints([a.pi.U for a in part])
        okv = cached_jit(
            _deciders_fused, "df", n, c, K, M, static_argnums=(5, 6, 7, 8)
        )(P, s, xis_stack, Uv, planes, n, c, pads, beffs)
        out.append(okv)
    return cached_jit(lambda xs: jnp.concatenate(xs), "dmc", len(out))(out)


def verify_chain(
    D: int,
    qss: list[list[Instance]],
    accs: list[Accumulator],
    pp: pp_mod.PublicParams,
    mesh=None,
    axis: str | None = None,
):
    """Batched equivalent of running the verifier at every chain step plus
    one final decider - the reference's "fast path" benchmark semantics
    (acc_compare_fast_helper, /root/reference/code/benches/acc.rs:64-74),
    restructured TPU-natively:

      * every succinct check of every step runs in ONE batched device MSM,
      * every U_0-commitment check likewise batches into one msm_rows call,
      * per-step challenge/bookkeeping math stays on the host (tiny),
      * the single final decider does the deferred n-point MSM.

    mesh/axis: optional jax Mesh to shard the instance-batch axes of both
    row-MSMs (data parallel) and the decider's deferred n-point MSM
    (intra-MSM parallel) across devices.  Verdicts are bit-identical to the
    single-device path.

    Raises ValueError on any rejection.
    """
    assert len(qss) == len(accs)
    import jax.numpy as jnp
    import numpy as _np

    from halo_accumulation_tpu.ops import curve as cv
    from halo_accumulation_tpu.ops.field import L as _L

    # ---- 1. enqueue ALL device work first (no fetch: one tunnel round
    # trip costs ~30 ms, so every verdict is combined into a single sync at
    # the end while the host does the transcript bookkeeping in parallel).
    # Without a mesh the whole verdict - every step's succinct checks, the
    # U_0 commitments, the final decider's row check, deferred n-MSM and U
    # equality - runs as ONE fused jit dispatch (_verify_chain_fused):
    # round-4 profiling showed the ~85 ms small-degree floor was dispatch
    # count, not math. ---------------------------------------------------
    from halo_accumulation_tpu.ops import msm as msm_mod

    last = accs[-1]
    flat = []
    step_slices = []
    for qs in qss:
        step_slices.append((len(flat), len(flat) + len(qs)))
        flat.extend((q.C, q.d, q.z, q.v, q.pi) for q in qs)
    # single-dispatch fusion pays at SMALL batches (the ~85 ms small-chain
    # dispatch floor); at k >= 100 the row-MSM compute dominates and the
    # multi-dispatch path amortizes - and every (n, batch-shape) pair is a
    # separate multi-minute XLA compile, so keeping large k on the shared
    # per-n graphs bounds warmup
    fused = mesh is None and msm_mod._impl() == "sortrows" and len(flat) <= 32 and len(accs) <= 32

    g0, g1 = pp.gs_host(2)
    B = len(accs)
    if mesh is not None:
        nd = mesh.devices.size
        B = nd * ((B + nd - 1) // nd)
    pts_rows, scs_rows = [], []
    for acc in accs:
        pts_rows.append([g0, g1, acc.pi_V.U])
        scs_rows.append([acc.pi_V.h[0], acc.pi_V.h[1], F.R - 1])
    for _ in range(B - len(accs)):
        pts_rows.append([None, None, None])
        scs_rows.append([0, 0, 0])
    Pu = cv.from_affine_ints([p for row in pts_rows for p in row])
    Pu = cv.PointVec(*(a.reshape(_L, B, 3) for a in Pu))
    su = FR.from_ints([x for row in scs_rows for x in row]).reshape(_L, B, 3)

    if fused:
        # batched succinct-check rows (host transcript replay only)
        parts = [pcdl.succinct_check_parts(C, d, z, v, pi, pp) for (C, d, z, v, pi) in flat]
        M = max(len(p[1]) for p in parts)
        Bs = 1
        while Bs < len(parts):
            Bs *= 2
        prow, srow = [], []
        for _, pts, scs in parts:
            prow.append(pts + [None] * (M - len(pts)))
            srow.append(scs + [0] * (M - len(scs)))
        for _ in range(Bs - len(parts)):
            prow.append([None] * M)
            srow.append([0] * M)
        Ps = cv.from_affine_ints([p for row in prow for p in row])
        Ps = cv.PointVec(*(a.reshape(_L, Bs, M) for a in Ps))
        ss = FR.from_ints([x for row in srow for x in row]).reshape(_L, Bs, M)
        # the final decider's host replay
        dh, dpts, dscs = pcdl.succinct_check_parts(last.C_bar, last.d, last.z, last.v, last.pi, pp)
        Md = len(dpts)
        Pd = cv.from_affine_ints(dpts)
        Pd = cv.PointVec(*(a.reshape(_L, 1, Md) for a in Pd))
        sd = FR.from_ints(dscs).reshape(_L, 1, Md)
        import jax.numpy as jnp

        xis1 = jnp.stack([FR.from_ints(dh.xis)])
        Uv = cv.from_affine_ints([last.pi.U])
        n = last.d + 1
        cw = msm_mod.window_size(n)
        padsT = tuple(msm_mod.pinned_pads(n, cw))
        beffsT = tuple(msm_mod._beffs(cw))
        allok = cached_jit(
            _verify_chain_fused, "vcf", n, Bs, M, B, Md, static_argnums=(9, 10, 11, 12)
        )(Ps, ss, Pu, su, Pd, sd, xis1, Uv, pp.gs_planes(n), n, cw, padsT, beffsT)
    else:
        parts_r, ok_succ = pcdl.succinct_check_batch_device(flat, pp, mesh=mesh, axis=axis)
        parts = parts_r
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec

            sh = NamedSharding(mesh, PartitionSpec(None, axis, None))
            Pu = cv.PointVec(*(jax.device_put(a, sh) for a in Pu))
            su = jax.device_put(su, sh)
        ok_u0 = cached_jit(pcdl._rows_and_isinf, "u0", B, 3)(Pu, su)
        # the one final decider, verdict left on device (deferred n-MSM
        # sharded over the mesh when given)
        ok_dec = pcdl.check_device(
            last.C_bar, last.d, last.z, last.v, last.pi, pp, mesh=mesh, axis=axis
        )

    # ---- 2. per-step host bookkeeping (challenges + equality checks),
    # overlapping the device queue --------------------------------------
    results = [(p[0], flat[b][4].U) for b, p in enumerate(parts)]
    for k, (qs, acc) in enumerate(zip(qss, accs)):
        lo, hi = step_slices[k]
        hs = AccumulatedHPolys(len(qs))
        hs.h_0 = list(acc.pi_V.h)
        Us = [acc.pi_V.U]
        for (h_i, U_i), q in zip(results[lo:hi], qs):
            hs.hs.append(h_i)
            Us.append(U_i)
            if q.d != D:
                raise ValueError(f"d_i != d at step {k}")
        hs.set_alpha(tr.rho_1(hs.serialize_for_alpha()))
        C = pcdl.host_msm(hs.alphas[: len(qs) + 1], Us)
        z = tr.rho_1(ser.ser_point(C), ser.ser_scalar(hs.alpha))
        C_bar = H.p_add(C, H.p_mul(acc.pi_V.w, pp.s))
        if C_bar != acc.C_bar:
            raise ValueError(f"C_bar' != C_bar at step {k}")
        if z != acc.z:
            raise ValueError(f"z' != z at step {k}")
        if hs.eval(acc.z) != acc.v:
            raise ValueError(f"h(z) != v at step {k}")

    # ---- 3. ONE fetch for every device verdict ----------------------------
    if fused:
        combined = _np.asarray(allok)
        nS = Bs
    else:
        combined = _np.asarray(
            cached_jit(lambda a, b, c: jnp.concatenate([a, b, c[None]]), "vc")(
                ok_succ, ok_u0, ok_dec
            )
        )
        nS = int(ok_succ.shape[0])
    for b in range(len(flat)):
        if not combined[b]:
            raise ValueError(f"C_(log_n) != CM.Commit_Sigma(c || v') (batch index {b})")
    for b in range(B):
        if not combined[nS + b]:
            raise ValueError(f"U_0 != PCDL.Commit(h_0) at step {b}")
    if not combined[-1]:
        # rule out a pinned-pad overflow before rejecting (see pcdl.check)
        decider(last, pp)


def serialize_accumulator(acc: Accumulator) -> bytes:
    """Checkpoint format for IVC resume (a capability the reference lacks:
    its EvalProof has no serialization derive, pcdl.rs:22).  Layout follows
    the ark-serialize conventions used everywhere else (fields in order;
    Vec = u64-LE length + items; Option = tag byte)."""
    out = ser.ser_point(acc.C_bar)
    out += ser.ser_u64(acc.d)
    out += ser.ser_scalar(acc.z)
    out += ser.ser_scalar(acc.v)
    out += acc.pi.serialize()
    out += ser.ser_scalar_vec(acc.pi_V.h)
    out += ser.ser_point(acc.pi_V.U)
    out += ser.ser_scalar(acc.pi_V.w)
    return out


def deserialize_accumulator(b: bytes) -> Accumulator:
    off = 0

    def take(n):
        nonlocal off
        chunk = b[off : off + n]
        off += n
        return chunk

    C_bar = ser.deser_point(take(ser.POINT_BYTES))
    d = int.from_bytes(take(8), "little")
    z = int.from_bytes(take(32), "little")
    v = int.from_bytes(take(32), "little")
    # EvalProof is self-delimiting: parse with a cursor
    rest = b[off:]
    pi, used = _parse_evalproof(rest)
    off += used
    nh = int.from_bytes(take(8), "little")
    h = [int.from_bytes(take(32), "little") for _ in range(nh)]
    U = ser.deser_point(take(ser.POINT_BYTES))
    w = int.from_bytes(take(32), "little")
    return Accumulator(C_bar, d, z, v, pi, AccumulatorHiding(h, U, w))


def _parse_evalproof(b: bytes):
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
    return pcdl.EvalProof(Ls, Rs, U, c, C_bar, w_prime), off
