"""Multi-chip MSM: points partitioned across a device mesh.

The reference is strictly single-core (SURVEY.md section 2: no rayon/
threads/GPU anywhere in code/src).  The TPU-native scaling axis for an MSM
is data-parallel over points: each chip computes per-window bucket sums for
its slice of the (points, scalars) vectors with the same staged Pippenger
stage-1 kernel used on one chip (ops/msm.py:_bucket_sums_chunk), partial
(W, B) bucket-sum planes are all-gathered over ICI and tree-added
identically on every chip, and the cheap window/bucket combine stages run
replicated.  Group addition is not a ring reduction XLA knows, so the
combine is an explicit all_gather + local complete-add tree rather than a
psum.

The per-window bucket-sum exchange is O(W * B) points regardless of N, so
communication amortizes as N grows: at N = 2^20 per chip and c = 15 the
exchange is ~120 MB against ~seconds of bucket-sum compute.

Built on the staged stage-1 kernel (_bucket_sums_chunk): its (W, L, B)
bucket-sum planes are exactly the per-shard partial state the all-gather
combine needs.  The single-chip default is the row-permutation pipeline
(ops/msm.py), whose group partials are already Horner-combined and so
would force a less parallel exchange.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from halo_accumulation_tpu.ops import curve as cv, msm as msm_mod

from halo_accumulation_tpu.runtime import cached_jit

AXIS = "shards"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def shard_points(Pv: cv.PointVec, mesh: Mesh) -> cv.PointVec:
    sh = NamedSharding(mesh, P(None, AXIS))
    return cv.PointVec(*(jax.device_put(c, sh) for c in Pv))


def _local_sums_and_combine(points, digits, c: int, pad: int):
    """shard_map body: local stage-1 bucket sums -> all_gather -> tree add.
    Returns the combined (3, W, L, B) bucket-sum stack, identical on every
    device (out_specs=P() replication)."""
    S = msm_mod._bucket_sums_chunk(points, digits, c, pad)  # (W, L, B) x3
    stacked = jnp.stack(S)  # (3, W, L, B)
    allp = jax.lax.all_gather(stacked, AXIS)  # (nd, 3, W, L, B)

    def as_pv(arr):
        """(k, 3, W, L, B) slice -> PointVec with coords (L, k, W, B)."""
        return cv.PointVec(*(jnp.moveaxis(arr[:, i], 2, 0) for i in range(3)))

    # tree-add the device axis with complete adds
    cur = allp
    while cur.shape[0] > 1:
        n = cur.shape[0]
        half = n // 2
        s = cv.padd(as_pv(cur[:half]), as_pv(cur[half : 2 * half]))  # (L, half, W, B)
        s = jnp.stack([jnp.moveaxis(a, 0, 2) for a in s], axis=1)  # (half, 3, W, L, B)
        if n % 2:
            s = jnp.concatenate([s, cur[2 * half :]], axis=0)
        cur = s
    return cur[0]  # (3, W, L, B)


def msm_sharded(points: cv.PointVec, scalars, mesh: Mesh, c: int | None = None) -> cv.PointVec:
    """MSM with points/scalars sharded over mesh's AXIS.  Host-orchestrated
    like msm_mod.msm: digits + bucket-pad measurement, then one shard_map
    dispatch for the heavy stage plus the replicated combine stages.
    Returns a replicated single projective point."""
    N = points.x.shape[1]
    nd = mesh.devices.size
    assert N % nd == 0, "point count must divide the mesh"
    if c is None:
        c = msm_mod.window_size(N // nd)
    digits = cached_jit(msm_mod._digits, c, static_argnums=1)(scalars, c)
    # pad must cover the max LOCAL bucket count; the global max is a safe
    # upper bound and keeps the measurement a single kernel.
    pad = msm_mod._measure_pad(digits, c, "sh")
    B = 1 << c
    assert B * pad * msm_mod.num_windows(c) <= msm_mod._SCATTER_BUDGET_COLS * 4, (
        "sharded MSM scatter would exceed the memory budget; "
        "shard more devices or lower c"
    )

    out = _sharded_fn(mesh, c, pad)(points, digits)  # (3, W, L, B) replicated
    S = tuple(out[i] for i in range(3))
    return cached_jit(msm_mod._weight_and_combine, "wc", c, static_argnums=1)(S, c)


@functools.lru_cache(maxsize=None)
def _sharded_fn(mesh: Mesh, c: int, pad: int):
    body = functools.partial(_local_sums_and_combine, c=c, pad=pad)
    sm = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(cv.PointVec(P(None, AXIS), P(None, AXIS), P(None, AXIS)), P(None, AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sm)
