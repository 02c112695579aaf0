"""Benchmark driver: prints ONE JSON line {metric, value, unit, vs_baseline}.

Headline metric: wall-clock of the accumulated-verification fast path at
d+1 = 16384 with a 10-step chain ("acc_cmp_f_16384_10"): one ASDL verifier
per step + one final decider, exactly the reference's fast helper
(/root/reference/code/benches/acc.rs:64-74), batched TPU-natively by
acc.verify_chain.  Directly comparable to the reference's published
299.49 ms (report/report.md:2140; BASELINE.md).  vs_baseline is the speedup
factor: reference_ms / ours_ms (>1 = faster than reference).

Also measured (side metrics, stderr):
  * acc_cmp_s_16384_10 - the slow/naive path (a full decider per step,
    benches/acc.rs:100-106) vs the reference's 1.5227 s.
  * acc_cmp_{f,s}_512_10 vs 67.098 / 94.834 ms.
  * single-decider wall clock at d+1=16384 (vs the derived ~153 ms anchor).
  * MSM throughput at N=2^20 (points/s) - degree range the reference cannot
    reach (compile-time URS caps it at 2^14, report.md:2081-2086).

Fallbacks: if a chain bench cannot run, the headline falls back to the MSM
metric so the driver always gets a parsable line.

Env knobs: HALO_BENCH_MSM_POW (default 20, 0 disables), HALO_BENCH_SMALL=0
disables the small grid rows, HALO_BENCH_GRID=0 limits the K=10 grid to
n=512 (default runs the full reference row set 512..8192 from committed
chain caches, plus the 16384 headline), HALO_BENCH_N / HALO_BENCH_K
override the headline chain, HALO_BENCH_REPS timing repetitions (default 3),
HALO_BENCH_DEADLINE seconds (default 1500 - the driver SIGTERMs ~1800 s in).

Phase 1 doubles as the MSM IMPL GATE: if the default sort-payload pipeline
cannot produce a number inside its guard, the process falls down the impl
ladder (sortrows -> rowperm -> staged via HALO_TPU_MSM_IMPL) before the
chain phases compile the same kernels.
"""

from __future__ import annotations

import atexit
import json
import os
import signal
import sys
import time

import numpy as np

# ---------------------------------------------------------------------------
# Result emission that survives anything: the headline JSON line is printed
# by an atexit handler (and SIGTERM/SIGINT convert to sys.exit so it runs),
# so a phase blowing the driver timeout still leaves a parsable line from
# whatever completed before it (round-2 failure mode: rc=124, no JSON).

_RESULT: dict = {"metric": "bench_failed", "value": 0, "unit": "none", "vs_baseline": 0}
_EMITTED = False


def set_result(metric: str, value, unit: str, vs_baseline):
    _RESULT.update(metric=metric, value=value, unit=unit, vs_baseline=vs_baseline)


def _emit():
    global _EMITTED
    if not _EMITTED:
        _EMITTED = True
        print(json.dumps(_RESULT), flush=True)


def _sig_exit(signum, frame):
    log(f"signal {signum}: emitting result and exiting")
    sys.exit(1)  # runs atexit


def _install_emit_handlers():
    """Called from main() only: importing bench (e.g. from tests) must not
    leak the atexit JSON line or take over signal dispositions."""
    atexit.register(_emit)
    signal.signal(signal.SIGTERM, _sig_exit)
    signal.signal(signal.SIGINT, _sig_exit)


class PhaseTimeout(Exception):
    pass


class phase_guard:
    """Hard wall-clock box around one bench phase (SIGALRM-based; phases
    run sequentially on the main thread).  A too-slow phase raises
    PhaseTimeout instead of eating the whole budget."""

    def __init__(self, seconds: float, name: str):
        self.seconds = max(1, int(seconds))
        self.name = name

    def __enter__(self):
        def on_alarm(signum, frame):
            raise PhaseTimeout(self.name)

        self._old = signal.signal(signal.SIGALRM, on_alarm)
        signal.alarm(self.seconds)
        self._t0 = time.time()
        return self

    timed_out = False

    def __exit__(self, et, ev, tb):
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)
        if et is PhaseTimeout:
            self.timed_out = True
            log(f"PHASE TIMEOUT: {self.name} exceeded {self.seconds}s")
            return True  # swallow; move to the next phase
        log(f"phase {self.name}: {time.time()-self._t0:.1f}s")
        return False

REF_MS = {  # BASELINE.md: the full 36-cell grid (report.md:2129-2164)
    ("s", 512, 10): 94.834, ("s", 512, 100): 940.91, ("s", 512, 1000): 9438.1,
    ("s", 1024, 10): 151.25, ("s", 1024, 100): 1504.2, ("s", 1024, 1000): 15087.0,
    ("s", 2048, 10): 258.92, ("s", 2048, 100): 2557.9, ("s", 2048, 1000): 25621.0,
    ("s", 4096, 10): 453.55, ("s", 4096, 100): 4494.5, ("s", 4096, 1000): 44970.0,
    ("s", 8192, 10): 838.05, ("s", 8192, 100): 8372.3, ("s", 8192, 1000): 82643.0,
    ("s", 16384, 10): 1522.7, ("s", 16384, 100): 15253.0, ("s", 16384, 1000): 152630.0,
    ("f", 512, 10): 67.098, ("f", 512, 100): 607.28, ("f", 512, 1000): 6018.3,
    ("f", 1024, 10): 77.597, ("f", 1024, 100): 662.03, ("f", 1024, 1000): 6511.4,
    ("f", 2048, 10): 99.973, ("f", 2048, 100): 798.48, ("f", 2048, 1000): 7775.2,
    ("f", 4096, 10): 139.35, ("f", 4096, 100): 1014.2, ("f", 4096, 1000): 9785.1,
    ("f", 8192, 10): 186.34, ("f", 8192, 100): 1161.1, ("f", 8192, 1000): 10899.0,
    ("f", 16384, 10): 299.49, ("f", 16384, 100): 1648.4, ("f", 16384, 1000): 15176.0,
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_best(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def crosscheck_rowperm_vs_ladder(n: int = 1024) -> bool:
    """Device self-check: the row-permutation pipeline (default) must agree
    with the exact windowed-ladder MSM - two genuinely different dispatch
    graphs (guards against the round-1 class of TPU fused-graph
    miscompiles; asserted non-vacuous by tests/test_msm.py's
    test_crosscheck_paths_differ).  The ladder replaced the staged pipeline
    here in round 4: staged's cold compile alone blew a 240 s guard, and a
    guard timeout wedges the remote compile service."""
    import jax.numpy as jnp

    from halo_accumulation_tpu.ops import curve as cv, msm as msm_mod
    from halo_accumulation_tpu.runtime import cached_jit

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 1 << 15, size=(18, n), dtype=np.int64).astype(np.uint32)
    arr[17] = 0
    s = jnp.asarray(arr)
    # synthetic distinct points: k*G via the fixed-base path is overkill -
    # reuse the URS generator multiples from a tiny pp
    from halo_accumulation_tpu import pp as pp_mod

    pp = pp_mod.get_pp(max(256, n))
    pts = pp.gs_points(n)
    c = msm_mod.window_size(n)
    r_rowperm, okv = msm_mod._rowperm_msm(
        pts, s, c, msm_mod.pinned_pads(n, c), msm_mod._beffs(c), rows=pp.gs_rows(n)
    )
    r_ladder = msm_mod.msm_ladder(pts, s)
    ok = bool(np.asarray(cached_jit(cv.peq)(r_rowperm, r_ladder))) and bool(np.asarray(okv))
    log(f"rowperm-vs-ladder cross-check at N={n}: {'OK' if ok else 'MISMATCH'}")
    return ok


def crosscheck_sortrows_vs_ladder(n: int = (1 << 19) + 8) -> bool:
    """Device self-check of the DEFAULT sort-payload pipeline against the
    exact windowed ladder at an N in the c=12 large-bucket regime (ADVICE
    r4: the old n=1024 check could never exercise the large-N window
    configuration where the round-4 boundary bug lived)."""
    import jax.numpy as jnp

    from halo_accumulation_tpu import pp as pp_mod
    from halo_accumulation_tpu.ops import curve as cv, msm as msm_mod
    from halo_accumulation_tpu.runtime import cached_jit

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 1 << 15, size=(18, n), dtype=np.int64).astype(np.uint32)
    arr[17] = 0
    s = jnp.asarray(arr)
    pp = pp_mod.get_pp(1 << 20)
    pts = pp.gs_points(n)
    c = msm_mod.window_size(n)
    outs, okv = msm_mod._sortrows_msm(
        pp.gs_planes(n), s, c, msm_mod.pinned_pads(n, c), msm_mod._beffs(c)
    )
    r_ladder = msm_mod.msm_ladder(pts, s)
    ok = bool(np.asarray(cached_jit(cv.peq)(outs[0], r_ladder))) and bool(np.asarray(okv))
    log(f"sortrows-vs-ladder cross-check at N={n}: {'OK' if ok else 'MISMATCH'}")
    return ok


def crosscheck_msm_native(pow2: int, side: dict):
    """Full-size independent check of the flagship MSM: the native C++
    Pippenger (halo_native.cpp, single-core host) computes the same 2^pow2
    MSM and must agree (VERDICT r4 weak #5: the 2^20 number had never been
    checked against an independent implementation)."""
    import jax.numpy as jnp

    from halo_accumulation_tpu import hostops as H, pp as pp_mod
    from halo_accumulation_tpu.ops import msm as msm_mod
    from halo_accumulation_tpu.pcdl import point_to_host

    N = 1 << pow2
    pp = pp_mod.get_pp(N)
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 1 << 15, size=(18, N), dtype=np.int64).astype(np.uint32)
    arr[17] = 0
    scalars = jnp.asarray(arr)
    got = point_to_host(msm_mod.msm(pp.gs_points(N), scalars, planes=pp.gs_planes(N)))
    t0 = time.time()
    ss = [int(x) for x in (arr.astype(object) * (1 << (15 * np.arange(18, dtype=object)))[:, None]).sum(axis=0)]
    pts = pp.gs_host(N)
    log(f"native crosscheck 2^{pow2}: host conversion {time.time()-t0:.1f}s")
    t0 = time.time()
    want = H.p_msm(ss, pts)
    log(f"native crosscheck 2^{pow2}: native MSM {time.time()-t0:.1f}s")
    ok = got == want
    side[f"msm_2^{pow2}_native_crosscheck_ok"] = bool(ok)
    log(f"native MSM cross-check 2^{pow2}: {'OK' if ok else 'MISMATCH'}")
    return ok


def bench_beyond(side: dict):
    """Run the protocol PAST the reference's compile-time URS ceiling
    (consts.rs caps d+1 at 2^14; report.md:2081-2086): a short accumulation
    chain at d+1 = 2^16 and a commit/open/decide at 2^20."""
    import jax  # noqa: F401

    from halo_accumulation_tpu import chain, pcdl, pp as pp_mod
    from halo_accumulation_tpu.ops.field import FR

    # accumulate + verify chain at 2^16
    n = 1 << 16
    pp = pp_mod.get_pp(n)
    rng = np.random.default_rng(21)
    cache = os.path.join(
        os.environ.get("HALO_BENCH_CHAIN_CACHE", ".chain_cache"), f"chain_{n}_4.bin"
    )
    t0 = time.time()
    if os.path.exists(cache):
        d, qss, accs = chain.load_chain(cache)
    else:
        d, qss, accs = chain.build_chain(rng, n, 4, pp)
        chain.save_chain(cache, d, qss, accs)
    log(f"2^16 chain ready in {time.time()-t0:.1f}s")
    chain.verify_chain_fast(d, qss, accs, pp)
    dt = time_best(lambda: chain.verify_chain_fast(d, qss, accs, pp), 2)
    side["acc_cmp_f_65536_4_ms"] = round(dt * 1e3, 2)
    log(f"acc_cmp_f_65536_4: {dt*1e3:.1f} ms (beyond the reference's max degree)")

    # commit/open/decide at 2^20
    n2 = 1 << 20
    pp2 = pp_mod.get_pp(n2)
    d2 = n2 - 1
    coeffs = FR.from_ints([chain.rand_scalar(rng) for _ in range(256)])
    # degree ~2^20 polynomial: random low words + the top coefficient set
    import jax.numpy as jnp

    top = FR.from_ints([1])
    cd = jnp.concatenate([coeffs, FR.zeros((n2 - 257,)), top], axis=1)
    z = chain.rand_scalar(rng)
    t0 = time.time()
    C = pcdl.commit(cd, d2, None, pp2)
    side["commit_1048576_ms"] = round((time.time() - t0) * 1e3, 1)
    t0 = time.time()
    pi = pcdl.open_(rng, cd, C, d2, z, None, pp2)
    side["open_1048576_ms"] = round((time.time() - t0) * 1e3, 1)
    import jax.numpy as _jnp  # noqa: F401

    zl = FR.from_ints([z])[:, 0]
    from halo_accumulation_tpu.ops import poly as poly_mod
    from halo_accumulation_tpu.runtime import cached_jit

    v = int(FR.to_ints(cached_jit(poly_mod.eval_poly, n2)(cd, zl)))
    t0 = time.time()
    pcdl.check(C, d2, z, v, pi, pp2)
    side["decider_1048576_ms"] = round((time.time() - t0) * 1e3, 1)
    t0 = time.time()
    pcdl.check(C, d2, z, v, pi, pp2)
    side["decider_1048576_warm_ms"] = round((time.time() - t0) * 1e3, 1)
    log(
        f"2^20: commit {side['commit_1048576_ms']} ms, open {side['open_1048576_ms']} ms, "
        f"decide {side['decider_1048576_warm_ms']} ms"
    )


def bench_msm(pow2: int, reps: int, side: dict):
    import jax
    import jax.numpy as jnp

    from halo_accumulation_tpu import pp as pp_mod, profiling
    from halo_accumulation_tpu.ops import msm as msm_mod

    N = 1 << pow2
    t0 = time.time()
    pp = pp_mod.get_pp(N)
    log(f"URS({N}) ready in {time.time()-t0:.1f}s")
    rng = np.random.default_rng(42)
    # random scalars directly as limbs (avoid 2^20 python-int conversions)
    arr = rng.integers(0, 1 << 15, size=(18, N), dtype=np.int64).astype(np.uint32)
    arr[17] = 0  # < 2^255; _digits canonicalizes mod r
    scalars = jnp.asarray(arr)
    points = pp.gs_points(N)

    c = msm_mod.window_size(N)
    log(f"MSM N=2^{pow2}: c={c}")
    t0 = time.time()
    r = msm_mod.msm(points, scalars)
    np.asarray(r.x)
    warm = time.time() - t0
    side[f"msm_2^{pow2}_warmup_s"] = round(warm, 1)
    log(f"MSM compile+first run {warm:.1f}s (impl={msm_mod._impl()})")

    # tunnel-safe timing: a DIFFERENT scalar vector per repetition (the
    # axon backend result-caches identical dispatches) and a forced fetch
    # (block_until_ready alone under-reports un-fetched work)
    variants = [jnp.roll(scalars, i + 1, axis=1) for i in range(reps)]
    for v in variants:
        v.block_until_ready()

    def run(i):
        np.asarray(msm_mod.msm(points, variants[i]).x)

    with profiling.trace(f"msm_2^{pow2}"):
        dts = []
        for i in range(reps):
            t0 = time.perf_counter()
            run(i)
            dts.append(time.perf_counter() - t0)
        dt = min(dts)
    pts_per_s = N / dt
    # rough roofline context from the analytic cost model (pinned per-window
    # pads/bucket-spaces - the shapes the rowperm pipeline actually runs)
    thr = profiling.msm_throughput_groups(
        N, c, msm_mod.pinned_pads(N, c), msm_mod._beffs(c), dt
    )
    side[f"msm_2^{pow2}_padds"] = thr["padds"]
    side[f"msm_2^{pow2}_u32_gops_per_s"] = thr["achieved_u32_gops_per_s"]
    side[f"msm_2^{pow2}_vpu_util_est"] = thr["vpu_util_est"]
    log(f"MSM 2^{pow2}: {dt*1e3:.1f} ms = {pts_per_s:.3e} points/s; {thr}")
    return pts_per_s, dt


def bench_h(side: dict, n: int = 256, k: int = 16):
    """HPoly micro-benches mirroring /root/reference/code/benches/h.rs:14-123
    (N=256, K=16): log-time h.eval vs naive dense evaluation, plus the dense
    expansion (get_poly).  The reference publishes no numbers for these
    (BASELINE.md), so they are side metrics quantifying the log-eval trick."""
    import jax

    from halo_accumulation_tpu import fields as F
    from halo_accumulation_tpu.ops import poly as poly_mod
    from halo_accumulation_tpu.ops.field import FR
    from halo_accumulation_tpu.runtime import cached_jit

    rng = np.random.default_rng(11)
    lg_n = n.bit_length() - 1
    xis = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(lg_n + 1)]
    zs = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(k)]

    # h_eval: O(lg n) host evaluation (HPoly::eval, pcdl.rs:79-91)
    t0 = time.perf_counter()
    for z in zs:
        poly_mod.h_eval_host(xis, z, F.R)
    dt = (time.perf_counter() - t0) / k
    side["h_eval_us"] = round(dt * 1e6, 2)

    # h_get_poly: dense O(n) tensor expansion on device (vs the reference's
    # serial poly-mult chain, pcdl.rs:56-77).  Distinct inputs per rep + a
    # forced fetch (tunnel-safe; see bench_msm).
    import jax.numpy as jnp

    fn = cached_jit(poly_mod.tensor_h_coeffs, lg_n)
    xis_vars = [
        FR.from_ints([x * (i + 1) % F.R for x in xis]) for i in range(3)
    ]
    np.asarray(fn(xis_vars[0]))
    dts = []
    for xv in xis_vars:
        t0 = time.perf_counter()
        np.asarray(fn(xv)[:, -1])
        dts.append(time.perf_counter() - t0)
    side["h_get_poly_ms"] = round(min(dts) * 1e3, 3)

    # h_eval_naive: dense n-coefficient evaluation on device (h.rs:46-60)
    coeffs = fn(xis_vars[0])
    ev = cached_jit(poly_mod.eval_poly, n)
    zvars = [FR.from_ints([z])[:, 0] for z in zs[:3]]
    np.asarray(ev(coeffs, zvars[0]))
    dts = []
    for zl in zvars:
        t0 = time.perf_counter()
        np.asarray(ev(coeffs, zl))
        dts.append(time.perf_counter() - t0)
    side["h_eval_naive_ms"] = round(min(dts) * 1e3, 3)

    # h_eval_multiple: sum of K log-time evals (h.rs:70-96); the naive
    # twin combines K dense expansions then evaluates (h.rs:99-123)
    hs_xis = [
        [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(lg_n + 1)]
        for _ in range(k)
    ]
    zm = zs[0]
    t0 = time.perf_counter()
    _ = sum(poly_mod.h_eval_host(x, zm, F.R) for x in hs_xis) % F.R
    side["h_eval_multiple_us"] = round((time.perf_counter() - t0) * 1e6, 2)

    av = FR.from_ints([zs[1]])[:, 0]

    def multi_naive(xv_list, al):
        acc = None
        cur = FR.from_ints([1])[:, 0]
        for xv in xv_list:
            hc = poly_mod.tensor_h_coeffs(xv)
            term = poly_mod.scale(hc, cur)
            acc = term if acc is None else poly_mod.add(acc, term)
            cur = FR.mul(cur, al)
        return poly_mod.eval_poly(acc, FR.from_ints([zm])[:, 0])

    xv_list = [FR.from_ints(x) for x in hs_xis]
    fnm = cached_jit(multi_naive, k, lg_n)
    np.asarray(fnm(xv_list, av))
    dts = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(fnm(xv_list, FR.from_ints([zs[1] + i])[:, 0]))
        dts.append(time.perf_counter() - t0)
    side["h_eval_multiple_naive_ms"] = round(min(dts) * 1e3, 3)

    # random_poly_eval_naive: dense degree-(n-1) Horner (h.rs:60-68)
    rc = FR.from_ints([int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(n)])
    np.asarray(ev(rc, zvars[0]))
    dts = []
    for zl in zvars:
        t0 = time.perf_counter()
        np.asarray(ev(rc, zl))
        dts.append(time.perf_counter() - t0)
    side["random_poly_eval_naive_ms"] = round(min(dts) * 1e3, 3)
    log(
        f"h benches (n={n}, k={k}): eval {side['h_eval_us']} us, "
        f"get_poly {side['h_get_poly_ms']} ms, naive eval {side['h_eval_naive_ms']} ms, "
        f"multiple {side['h_eval_multiple_us']} us / naive "
        f"{side['h_eval_multiple_naive_ms']} ms, rand-naive "
        f"{side['random_poly_eval_naive_ms']} ms"
    )


def bench_acc_units(side: dict, n: int = 1024, reps: int = 3):
    """acc_prover / acc_verifier / acc_decider unit benches, mirroring
    /root/reference/code/benches/acc.rs:31-60 (one fresh instance, N=1024).
    The reference publishes no numbers for these (BASELINE.md), but the
    prover number is the gate on chain-building cost - a regression here
    stayed invisible for four rounds (VERDICT r4)."""
    from halo_accumulation_tpu import acc as acc_mod, chain, pp as pp_mod

    pp = pp_mod.get_pp(max(n, 256))
    rng = np.random.default_rng(13)
    d = n - 1
    t0 = time.time()
    qs = [chain.random_instance(rng, d, pp)]
    a = acc_mod.prover(rng, d, qs, pp)
    log(f"acc units n={n}: instance+prover warmup {time.time()-t0:.1f}s")
    dt = time_best(lambda: acc_mod.prover(rng, d, qs, pp), reps)
    side[f"acc_prover_{n}_ms"] = round(dt * 1e3, 2)
    dt_v = time_best(lambda: acc_mod.verifier(d, qs, a, pp), reps)
    side[f"acc_verifier_{n}_ms"] = round(dt_v * 1e3, 2)
    dt_d = time_best(lambda: acc_mod.decider(a, pp), reps)
    side[f"acc_decider_{n}_ms"] = round(dt_d * 1e3, 2)
    log(
        f"acc units n={n}: prover {side[f'acc_prover_{n}_ms']} ms, "
        f"verifier {side[f'acc_verifier_{n}_ms']} ms, "
        f"decider {side[f'acc_decider_{n}_ms']} ms"
    )


def bench_chain(n: int, k: int, reps: int, side: dict):
    """Build a k-step chain at d+1 = n, then time fast + slow verification.
    Chain construction (prover work) is setup, exactly like the reference
    benches (criterion only times the helpers)."""
    import jax

    from halo_accumulation_tpu import acc as acc_mod, chain, pp as pp_mod

    pp = pp_mod.get_pp(n)
    rng = np.random.default_rng(7)
    t0 = time.time()
    cache = os.path.join(
        os.environ.get("HALO_BENCH_CHAIN_CACHE", ".chain_cache"), f"chain_{n}_{k}.bin"
    )
    loaded = False
    if os.environ.get("HALO_BENCH_CHAIN_CACHE") != "0" and os.path.exists(cache):
        d, qss, accs = chain.load_chain(cache)
        if d == n - 1 and len(accs) == k:
            loaded = True
            log(f"chain n={n} k={k} loaded from cache in {time.time()-t0:.1f}s")
        else:
            log(f"chain cache {cache} is stale (d={d}, k={len(accs)}); rebuilding")
    if not loaded:
        d, qss, accs = chain.build_chain(rng, n, k, pp)
        log(f"chain n={n} k={k} built in {time.time()-t0:.1f}s")
        if os.environ.get("HALO_BENCH_CHAIN_CACHE") != "0":
            chain.save_chain(cache, d, qss, accs)

    # fast path (headline semantics)
    t0 = time.time()
    chain.verify_chain_fast(d, qss, accs, pp)
    log(f"verify_chain_fast warmup {time.time()-t0:.1f}s")
    dt_f = time_best(lambda: chain.verify_chain_fast(d, qss, accs, pp), reps)
    ref = REF_MS.get(("f", n, k))
    side[f"acc_cmp_f_{n}_{k}_ms"] = round(dt_f * 1e3, 2)
    if ref:
        side[f"acc_cmp_f_{n}_{k}_vs_ref"] = round(ref / (dt_f * 1e3), 2)
    log(f"acc_cmp_f_{n}_{k}: {dt_f*1e3:.1f} ms (ref {ref} ms)")

    # single decider anchor
    dt_d = time_best(lambda: acc_mod.decider(accs[-1], pp), reps)
    side[f"decider_{n}_ms"] = round(dt_d * 1e3, 2)
    log(f"decider n={n}: {dt_d*1e3:.1f} ms")

    # slow path
    dt_s = time_best(lambda: chain.verify_chain_slow(accs, pp), max(1, reps - 1))
    ref_s = REF_MS.get(("s", n, k))
    side[f"acc_cmp_s_{n}_{k}_ms"] = round(dt_s * 1e3, 2)
    if ref_s:
        side[f"acc_cmp_s_{n}_{k}_vs_ref"] = round(ref_s / (dt_s * 1e3), 2)
    log(f"acc_cmp_s_{n}_{k}: {dt_s*1e3:.1f} ms (ref {ref_s} ms)")
    return dt_f


def main():
    _install_emit_handlers()
    from halo_accumulation_tpu import runtime

    runtime.init()
    import jax

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    reps = int(os.environ.get("HALO_BENCH_REPS", "3"))
    # round-3 postmortem: the driver SIGTERMs around ~1800 s, so phases are
    # sized to a 1500 s total (VERDICT r3 weak #8)
    deadline = time.time() + float(os.environ.get("HALO_BENCH_DEADLINE", "1500"))
    side: dict = {}
    have_headline = False

    def remaining():
        return deadline - time.time()

    n = int(os.environ.get("HALO_BENCH_N", "16384"))
    k = int(os.environ.get("HALO_BENCH_K", "10"))
    # reference-derived MSM anchor: decider at d+1=16384 = 153 ms dominated
    # by its 16384-point MSM -> ~1.07e5 points/s single-core.
    ref_rate = 16384 / 0.15263

    def guard(name, frac_cap):
        return phase_guard(min(max(remaining() - 120, 1), frac_cap), name)

    def service_alive():
        """One boxed trivial dispatch+fetch (distinct input per call to
        dodge the axon result cache)."""
        ok = [False]
        with phase_guard(45, "service-probe"):
            import jax.numpy as jnp

            int(np.asarray(jnp.arange(3) + int(time.time()) % 1000)[2])
            ok[0] = True
        return ok[0]

    def wait_service(margin):
        """A phase timeout usually means the guard's SIGALRM interrupted a
        remote compile, which WEDGES the compile service for ~10-30 min -
        every later phase would then burn its own guard on a dead service.
        Poll until it answers (or the budget minus `margin` is gone) so the
        remaining phases run against a live service."""
        t0 = time.time()
        while remaining() > margin:
            if service_alive():
                if time.time() - t0 > 50:
                    log(f"service recovered after {time.time()-t0:.0f}s")
                return True
            log(f"service wedged; retrying in 45s (budget {remaining():.0f}s)")
            time.sleep(45)
        return False

    # Phases ordered by value-per-second; each is hard time-boxed and the
    # best result so far is always registered (atexit emits it no matter
    # how the process ends).

    # a wedged compile service at startup (e.g. a previously interrupted
    # compile) would silently burn every phase guard; wait for it first,
    # keeping >= 900 s (the core phases) in reserve
    wait_service(900.0)

    # 1. MSM 2^14: the always-available fallback metric, and the IMPL GATE
    # (VERDICT r3 ask #1): if the default impl cannot produce a number
    # inside its guard, fall down the impl ladder for the REST OF THE
    # PROCESS (decider/verify paths compile the same MSM kernels) - a
    # slower measured number beats a bench_failed zero.  The default must
    # match msm._impl()'s default: the fused verify path only engages
    # under sortrows, so forcing rowperm here would silently bench the
    # round-4 pipeline.
    impls = [os.environ.get("HALO_TPU_MSM_IMPL", "sortrows")]
    for fb in ("rowperm", "staged"):
        if fb not in impls:
            impls.append(fb)
    for impl in impls:
        os.environ["HALO_TPU_MSM_IMPL"] = impl
        phase_ok = False
        try:
            with guard(f"msm_2^14[{impl}]", 420):
                pts_per_s, dt = bench_msm(14, reps, side)
                side["msm_2^14_points_per_s"] = round(pts_per_s, 1)
                side["msm_2^14_ms"] = round(dt * 1e3, 2)
                side["msm_impl"] = impl
                if not have_headline:
                    set_result(
                        "msm_points_per_sec_2^14", round(pts_per_s, 1), "points/s",
                        round(pts_per_s / ref_rate, 2),
                    )
                phase_ok = True
        except Exception:  # noqa: BLE001
            import traceback

            traceback.print_exc(file=sys.stderr)
        if phase_ok:
            break
        log(f"MSM impl '{impl}' failed its guard" + (
            "" if impl == impls[-1] else "; falling down the impl ladder"))
        wait_service(500)  # keep >= the headline guard in reserve

    # 2. The headline chain (cache-backed; tools/warm.py builds + persists).
    headline_gd = None
    try:
        with guard(f"acc_cmp_f_{n}_{k}", 500) as headline_gd:
            dt_f = bench_chain(n, k, reps, side)
            ref = REF_MS.get(("f", n, k))
            if ref:
                set_result(
                    f"acc_cmp_f_{n}_{k}", round(dt_f * 1e3, 2), "ms",
                    round(ref / (dt_f * 1e3), 2),
                )
                have_headline = True
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc(file=sys.stderr)
        log(f"headline chain bench failed: {type(e).__name__}: {e}")
    if headline_gd is not None and headline_gd.timed_out:
        wait_service(300)

    # 3. MSM at 2^20 (the BASELINE.json metric; URS beyond the reference's
    # compile-time cap).
    msm_pow = int(os.environ.get("HALO_BENCH_MSM_POW", "20"))
    if msm_pow and msm_pow != 14:
        try:
            with guard(f"msm_2^{msm_pow}", 400) as gd:
                pts_per_s, dt = bench_msm(msm_pow, reps, side)
                side[f"msm_2^{msm_pow}_points_per_s"] = round(pts_per_s, 1)
                side[f"msm_2^{msm_pow}_ms"] = round(dt * 1e3, 1)
        except Exception:  # noqa: BLE001
            import traceback

            traceback.print_exc(file=sys.stderr)
        if gd.timed_out:
            wait_service(180)

    # 3a. independent native (C++ Pippenger) cross-check of the flagship MSM
    if os.environ.get("HALO_BENCH_NATIVE_XCHK", "1") != "0":
        try:
            with guard("native_crosscheck", 300) as gd:
                crosscheck_msm_native(16, side)
                if remaining() > 900:
                    crosscheck_msm_native(20, side)
        except Exception as e:  # noqa: BLE001
            log(f"native cross-check failed: {type(e).__name__}: {e}")
        if gd.timed_out:
            wait_service(180)

    # 3b. Prover/verifier/decider unit benches (benches/acc.rs:31-60) at
    # the reference's N=1024 plus the headline degree.
    if os.environ.get("HALO_BENCH_UNITS", "1") != "0":
        for un in (1024, 16384):
            try:
                with guard(f"acc_units_{un}", 240) as gd:
                    bench_acc_units(side, n=un, reps=max(1, reps - 1))
            except Exception as e:  # noqa: BLE001
                log(f"acc units n={un} failed: {type(e).__name__}: {e}")
            if gd.timed_out:
                wait_service(180)

    # 4. K=100 amortization cells (where batching should shine vs Rust).
    if os.environ.get("HALO_BENCH_K100", "1") != "0":
        try:
            with guard("acc_cmp_f_16384_100", 300) as gd:
                bench_chain(16384, 100, max(1, reps - 1), side)
        except Exception as e:  # noqa: BLE001
            log(f"K=100 bench failed: {type(e).__name__}: {e}")
        if gd.timed_out:
            wait_service(180)

    # 5. h micro-benches (cheap).  The rowperm-vs-staged cross-check moved
    # to the LAST phase: it cold-compiles the whole staged pipeline, and a
    # guard timeout there can wedge the compile service for anything after.
    try:
        with guard("h_benches", 120) as gd:
            bench_h(side)
    except Exception as e:  # noqa: BLE001
        log(f"h bench failed: {type(e).__name__}: {e}")
    if gd.timed_out:
        wait_service(180)

    # 6. Small-n grid rows.
    small_ns = [512, 1024, 2048, 4096, 8192]
    if os.environ.get("HALO_BENCH_GRID", "1") == "0":
        small_ns = [512]
    if os.environ.get("HALO_BENCH_SMALL", "1") != "0":
        for sn in small_ns:
            if remaining() <= 240:
                log(f"skipping chain n={sn}: out of time budget")
                break
            try:
                with guard(f"chain_{sn}_10", 240) as gd:
                    bench_chain(sn, 10, reps, side)
            except Exception as e:  # noqa: BLE001 - bench must always emit JSON
                import traceback

                traceback.print_exc(file=sys.stderr)
                log(f"chain n={sn} bench failed: {type(e).__name__}: {e}")
            if gd.timed_out:
                wait_service(180)

    # 7. K=100 / K=1000 amortization cells from committed chain caches
    # (chain construction is setup, exactly as criterion treats it;
    # building K=1000 chains in-bench would blow the budget - see
    # tools/build_chain_cache.py).  Only cells with a cache present run.
    if os.environ.get("HALO_BENCH_GRID_BIG", "1") != "0":
        cells = [(sn, 100) for sn in (512, 1024, 2048, 4096, 8192)]
        cells += [(sn, 1000) for sn in (512, 1024, 16384)]
        for sn, sk in cells:
            cache = os.path.join(
                os.environ.get("HALO_BENCH_CHAIN_CACHE", ".chain_cache"),
                f"chain_{sn}_{sk}.bin",
            )
            if not os.path.exists(cache):
                log(f"grid cell {sn}/{sk}: no cache, skipping")
                continue
            if remaining() <= 180:
                log(f"grid cell {sn}/{sk}: out of budget")
                break
            try:
                with guard(f"chain_{sn}_{sk}", 300) as gd:
                    bench_chain(sn, sk, 1, side)
            except Exception as e:  # noqa: BLE001
                log(f"grid cell {sn}/{sk} failed: {type(e).__name__}: {e}")
            if gd.timed_out:
                wait_service(180)

    # 8. Past the reference's ceiling: accumulate at d+1 = 2^16 and a
    # decider at 2^20 (the capability the runtime URS exists for;
    # report.md:2081-2086 calls the compile-time 2^14 cap THE limitation).
    if os.environ.get("HALO_BENCH_BEYOND", "1") != "0" and remaining() > 240:
        try:
            with guard("beyond_2^14", min(420, remaining() - 60)) as gd:
                bench_beyond(side)
        except Exception as e:  # noqa: BLE001
            log(f"beyond-2^14 bench failed: {type(e).__name__}: {e}")
        if gd.timed_out:
            wait_service(180)

    try:
        with guard("crosscheck", 240):
            side["rowperm_vs_ladder_ok"] = crosscheck_rowperm_vs_ladder()
            side["sortrows_vs_ladder_ok"] = crosscheck_sortrows_vs_ladder()
    except Exception as e:  # noqa: BLE001
        log(f"cross-check failed to run: {type(e).__name__}: {e}")

    log("side metrics: " + json.dumps(side))
    _emit()


if __name__ == "__main__":
    main()
