"""Multi-chip MSM: points partitioned across a device mesh.

The reference is strictly single-core (SURVEY.md section 2: no rayon/
threads/GPU anywhere in code/src).  The TPU-native scaling axis for an MSM
is data-parallel over points: each chip buckets and reduces its slice of
the (points, scalars) vectors with the same static-shape Pippenger kernel
used on one chip, producing one partial point; partials are then
all-gathered over ICI (a few hundred bytes) and tree-added identically on
every chip.  Group addition is not a ring reduction XLA knows, so the
combine is an explicit all_gather + local complete-add tree rather than a
psum.

Scalar vectors in this library come from polynomial coefficients, so the
sharding is laid out on the point index: C = sum_shards sum_i s_i G_i.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from halo_accumulation_tpu.ops import curve as cv, msm as msm_mod
from halo_accumulation_tpu.ops.field import FR, L
from halo_accumulation_tpu.runtime import cached_jit

AXIS = "shards"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def shard_points(P: cv.PointVec, mesh: Mesh) -> cv.PointVec:
    sh = NamedSharding(mesh, jax.sharding.PartitionSpec(None, AXIS))
    return cv.PointVec(*(jax.device_put(c, sh) for c in P))


def _local_msm_and_combine(points, digits, c: int, pad: int):
    """shard_map body: local Pippenger -> all_gather -> tree add."""
    acc = msm_mod._pippenger(points, digits, c, pad)  # (16,) coords
    stacked = jnp.stack(list(acc))  # (3, 16)
    allp = jax.lax.all_gather(stacked, AXIS)  # (nd, 3, 16)
    nd = allp.shape[0]
    total = cv.PointVec(allp[0, 0], allp[0, 1], allp[0, 2])
    for i in range(1, nd):
        total = cv.padd(total, cv.PointVec(allp[i, 0], allp[i, 1], allp[i, 2]))
    return jnp.stack(list(total))


def msm_sharded(points: cv.PointVec, scalars, mesh: Mesh, c: int | None = None) -> cv.PointVec:
    """MSM with points/scalars sharded over mesh's AXIS.  Host-orchestrated
    like msm_mod.msm: digits + bucket-pad measurement, then one shard_map.
    Returns a replicated single projective point."""
    N = points.x.shape[1]
    nd = mesh.devices.size
    assert N % nd == 0, "point count must divide the mesh"
    if c is None:
        c = msm_mod.window_size(N // nd)
    digits = cached_jit(msm_mod._digits, c, static_argnums=1)(scalars, c)
    # pad must cover the max LOCAL bucket count; use the global max (safe).
    maxc = int(cached_jit(msm_mod._max_bucket_count)(digits))
    pad = 1
    while pad < maxc:
        pad *= 2
    pad = min(pad, N // nd)

    fn = _sharded_fn(mesh, c, pad)
    out = fn(points, digits)
    return cv.PointVec(out[0], out[1], out[2])


@functools.lru_cache(maxsize=None)
def _sharded_fn(mesh: Mesh, c: int, pad: int):
    body = functools.partial(_local_msm_and_combine, c=c, pad=pad)
    sm = shard_map(
        body,
        mesh=mesh,
        in_specs=(cv.PointVec(P(None, AXIS), P(None, AXIS), P(None, AXIS)), P(None, AXIS)),
        out_specs=P(),
        check_rep=False,
    )
    return jax.jit(sm)
