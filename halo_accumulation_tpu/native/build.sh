#!/usr/bin/env bash
# Build the native CPU backend (also built on demand at import time;
# see __init__.py).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libhalo_native.so halo_native.cpp -lpthread
