#!/usr/bin/env bash
# Local CI gate: syntax check + the fast test subset (< ~3 min warm).
# Full suite: python -m pytest tests/ -q   (slower: XLA:CPU compiles the
# large field/curve kernels; see tests/conftest.py).
set -euo pipefail
cd "$(dirname "$0")/.."

python -m compileall -q halo_accumulation_tpu tests tools bench.py __graft_entry__.py

python -m pytest tests/test_field.py tests/test_transcript.py tests/test_poly.py \
    tests/test_native.py tests/test_chain.py::test_api_smoke -q "$@"

python tools/lint.py
