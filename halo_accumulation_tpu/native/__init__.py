"""ctypes bindings for the native CPU backend (libhalo_native.so).

Compiled on demand with g++ (the image has no pip/cargo; setuptools-style
builds are overkill for one TU).  All entry points degrade gracefully: if
the library cannot be built, `available()` returns False and callers fall
back to the pure-Python oracle.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).resolve().parent
_SO = _DIR / "libhalo_native.so"
_SRC = _DIR / "halo_native.cpp"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", str(_SO), str(_SRC), "-lpthread"],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.halo_msm.argtypes = [ctypes.c_uint64, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.halo_scalar_mul.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.halo_point_add.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.halo_sha3_256.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p]
    lib.halo_urs.argtypes = [ctypes.c_uint64, ctypes.c_uint64, ctypes.c_char_p]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _pt_bytes(P) -> bytes:
    if P is None:
        return b"\x00" * 64
    return P[0].to_bytes(32, "little") + P[1].to_bytes(32, "little")


def _pt_from(b: bytes):
    x = int.from_bytes(b[:32], "little")
    y = int.from_bytes(b[32:64], "little")
    if x == 0 and y == 0:
        return None
    return (x, y)


def msm(scalars, points):
    """Native Pippenger MSM over host ints. scalars: list[int], points:
    list[(x,y)|None]."""
    lib = get_lib()
    n = len(scalars)
    sb = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    pb = b"".join(_pt_bytes(P) for P in points)
    out = ctypes.create_string_buffer(64)
    lib.halo_msm(n, sb, pb, out)
    return _pt_from(out.raw)


def scalar_mul(k: int, P):
    lib = get_lib()
    out = ctypes.create_string_buffer(64)
    lib.halo_scalar_mul(_pt_bytes(P), int(k).to_bytes(32, "little"), out)
    return _pt_from(out.raw)


def point_add(P, Q):
    lib = get_lib()
    out = ctypes.create_string_buffer(64)
    lib.halo_point_add(_pt_bytes(P), _pt_bytes(Q), out)
    return _pt_from(out.raw)


def urs(start: int, n: int):
    """Generator points for URS indices [start, start+n) as (x, y) pairs."""
    lib = get_lib()
    out = ctypes.create_string_buffer(64 * n)
    lib.halo_urs(start, n, out)
    return [_pt_from(out.raw[64 * i : 64 * (i + 1)]) for i in range(n)]


def sha3(data: bytes) -> bytes:
    lib = get_lib()
    out = ctypes.create_string_buffer(32)
    lib.halo_sha3_256(data, len(data), out)
    return out.raw
