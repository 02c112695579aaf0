"""Test harness config: force the CPU backend (8 virtual devices) so the
multi-chip sharding paths are exercised without TPU hardware (mirrors the
reference's cargo-test-only strategy, /root/reference/README.md:80-82, but
adds the distributed axis the reference lacks)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "backend_optimization_level" not in flags:
    # tests only check semantics; trade XLA:CPU codegen quality for much
    # faster compiles of the large straight-line field/curve graphs
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["HALO_TPU_PLATFORM"] = "cpu"
# long XLA:CPU pytest sessions JIT-map thousands of code sections; opt in to
# the vm.max_map_count raise (no-op without privileges)
os.environ.setdefault("HALO_TPU_RAISE_MAP_COUNT", "1")

from halo_accumulation_tpu import runtime

runtime.init()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
