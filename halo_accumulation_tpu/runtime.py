"""Runtime/config layer: device selection, persistent compile cache, jit
helpers.

The reference has no runtime layer at all (single-threaded Rust, compile-time
URS; /root/reference/code/src/consts.rs).  Here the runtime owns:

  * backend selection (TPU when available, CPU fallback / test mode),
  * a persistent XLA compilation cache (our field/curve kernels are large
    straight-line HLO graphs; caching makes them compile-once-ever),
  * a keyed jit cache so every (function, static-config) pair is traced and
    compiled exactly once per process.
"""

from __future__ import annotations

import os
import pathlib

import jax

_REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
_CACHE_DIR = os.environ.get("HALO_TPU_COMPILE_CACHE", str(_REPO_ROOT / ".jax_cache"))

_initialized = False

# Each XLA:CPU executable JIT-maps a few hundred small code/rodata/data
# sections (one triple per emitted kernel module).  A long pytest session
# compiles hundreds of executables, which blows straight through the Linux
# default vm.max_map_count (65530) and crashes the process inside LLVM's
# section allocator with ENOMEM.  Raise the limit best-effort (root only,
# same class of requirement as Elasticsearch/mongod); harmless if denied.
_MAP_COUNT_TARGET = 1 << 20


def _raise_map_count_limit():
    """System-wide, persistent host mutation - only performed when opted in
    via HALO_TPU_RAISE_MAP_COUNT=1 (same class of requirement as
    Elasticsearch/mongod), and logged when it happens."""
    if os.environ.get("HALO_TPU_RAISE_MAP_COUNT", "0") != "1":
        return
    path = "/proc/sys/vm/max_map_count"
    try:
        with open(path) as f:
            cur = int(f.read())
        if cur >= _MAP_COUNT_TARGET:
            return
        with open(path, "w") as f:
            f.write(str(_MAP_COUNT_TARGET))
        import sys

        print(
            f"halo_accumulation_tpu: raised vm.max_map_count {cur} -> {_MAP_COUNT_TARGET}",
            file=sys.stderr,
        )
    except (OSError, ValueError):
        pass


def init(platform: str | None = None):
    """Initialize backend + compile cache.  platform: 'cpu', 'tpu' or None
    (= honour HALO_TPU_PLATFORM env, else default backend)."""
    global _initialized
    if _initialized:
        return
    _raise_map_count_limit()
    plat = platform or os.environ.get("HALO_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    # namespace the persistent cache by backend: artifacts compiled by the
    # remote-tunnel service carry different host CPU features than this
    # machine, and loading them cross-machine is at best noisy
    cache_dir = os.path.join(_CACHE_DIR, jax.default_backend())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    _initialized = True


_jit_cache: dict = {}


def cached_jit(fn, *static_key, **jit_kwargs):
    """jit(fn) memoized on (fn qualname, static_key) so repeated calls reuse
    one traced/compiled wrapper (bound methods etc. would otherwise retrace).
    """
    key = (getattr(fn, "__qualname__", repr(fn)), static_key, tuple(sorted(jit_kwargs.items())))
    w = _jit_cache.get(key)
    if w is None:
        w = jax.jit(fn, **jit_kwargs)
        _jit_cache[key] = w
    return w


def device_put_sharded_or_single(x):
    return jax.device_put(x)
