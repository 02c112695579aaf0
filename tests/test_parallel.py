"""Sharded MSM on the virtual 8-device CPU mesh == single-device result.
(The reference has no distributed layer; this is the psum/all-gather
equivalent demanded by the TPU build - SURVEY.md section 2 parallelism.)"""

import numpy as np
import pytest

import jax

from halo_accumulation_tpu import fields as F
from halo_accumulation_tpu.ops import curve as cv, msm
from halo_accumulation_tpu.ops.field import FR
from halo_accumulation_tpu.parallel import msm_sharded as pms
from halo_accumulation_tpu.runtime import cached_jit


def test_msm_sharded_matches(rng):
    n_dev = len(jax.devices())
    assert n_dev == 8, f"expected 8 virtual devices, got {n_dev}"
    mesh = pms.make_mesh()
    N = 64
    G = (F.G_X, F.G_Y)
    pts = [F.p_mul(int.from_bytes(rng.bytes(40), "little") % F.R, G) for _ in range(N)]
    ss = [int.from_bytes(rng.bytes(40), "little") % F.R for _ in range(N)]
    P = cv.from_affine_ints(pts)
    s = FR.from_ints(ss)
    want = F.p_msm(ss, pts)

    Psh = pms.shard_points(P, mesh)
    R = pms.msm_sharded(Psh, s, mesh)
    from halo_accumulation_tpu.pcdl import point_to_host

    assert point_to_host(R) == want
