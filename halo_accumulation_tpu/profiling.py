"""Observability: analytic kernel cost model + profiler trace hooks.

The reference has no tracing/profiling at all (SURVEY.md section 5, only
criterion wall-clocks); this module provides the TPU-side equivalents:

  * an analytic cost model for the staged Pippenger MSM (complete-add
    counts per stage) so benches can report achieved op throughput and a
    rough VPU-utilization ("MFU") estimate alongside wall-clock,
  * a jax.profiler trace context, enabled by HALO_TPU_TRACE=<dir>, for
    per-kernel timing in TensorBoard/xprof.
"""

from __future__ import annotations

import contextlib
import os


# rough per-op accounting for the 18x15-bit limb kernels (ops/field.py):
# a field mul is 18x18 widening u32 multiplies plus carry/reduction adds;
# a complete projective add (RCB16 a=0) is 12 muls + 2 small-muls + ~11
# add/sub chains.
U32_OPS_PER_FMUL = 2500
FMUL_PER_PADD = 14.0
FMUL_PER_PDBL = 10.0

# nominal int32 VPU throughput of one TPU v5e core (8x128x4 ALUs ~ 940 MHz),
# used only to contextualize achieved throughput; not a precise roofline.
V5E_VPU_OPS_PER_S = 3.8e12


def msm_cost(N: int, c: int, pad: int, chunks: int = 1) -> dict:
    """Complete-add counts for the staged Pippenger at (N, c, pad)."""
    W = (255 + c - 1) // c
    B = 1 << c
    s1 = W * B * max(0, pad - 1) * chunks + (chunks - 1) * W * B
    s2 = W * B * c  # lg(B) = c suffix steps
    s3 = W * (B - 1)
    s4_dbl = 255
    padds = s1 + s2 + s3 + W
    fmuls = padds * FMUL_PER_PADD + s4_dbl * FMUL_PER_PDBL
    return {
        "padds": int(padds),
        "fmuls": int(fmuls),
        "u32_gops": round(fmuls * U32_OPS_PER_FMUL / 1e9, 1),
    }


def msm_cost_groups(N: int, c: int, pads: list, beffs: list) -> dict:
    """Complete-add counts for the row-permutation pipeline with its real
    per-window (pad, beff) structure (ops/msm.pinned_pads/_beffs): bucket
    reduction beff*(pad-1) per window + 2*lg(beff)*beff suffix-doubling
    weighting + the global Horner combine."""
    padds = 0
    for pad, beff in zip(pads, beffs):
        padds += beff * max(0, pad - 1)
        lgB = max(0, beff.bit_length() - 1)
        padds += 2 * lgB * beff
    W = len(pads)
    padds += W  # horner adds
    fmuls = padds * FMUL_PER_PADD + 255 * FMUL_PER_PDBL
    return {
        "padds": int(padds),
        "fmuls": int(fmuls),
        "u32_gops": round(fmuls * U32_OPS_PER_FMUL / 1e9, 1),
    }


def msm_throughput_groups(N: int, c: int, pads: list, beffs: list, seconds: float) -> dict:
    cost = msm_cost_groups(N, c, pads, beffs)
    gops = cost["u32_gops"] / seconds
    return {
        **cost,
        "points_per_s": round(N / seconds, 1),
        "achieved_u32_gops_per_s": round(gops, 1),
        "vpu_util_est": round(gops * 1e9 / V5E_VPU_OPS_PER_S, 3),
    }


def msm_throughput(N: int, c: int, pad: int, seconds: float, chunks: int = 1) -> dict:
    cost = msm_cost(N, c, pad, chunks)
    gops = cost["u32_gops"] / seconds
    return {
        **cost,
        "points_per_s": round(N / seconds, 1),
        "achieved_u32_gops_per_s": round(gops, 1),
        "vpu_util_est": round(gops * 1e9 / V5E_VPU_OPS_PER_S, 3),
    }


@contextlib.contextmanager
def trace(label: str = "halo"):
    """jax.profiler trace context, active when HALO_TPU_TRACE=<dir> is set."""
    trace_dir = os.environ.get("HALO_TPU_TRACE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield
