"""ctypes bridge to the native host library (native/libnbody_host.so).

Provides the C++ implementations of the glibc-rand init loop and the mmap PPM
frame blit, with transparent lazy build (make) and pure-Python fallback.
Results are bit-identical to the Python implementations; the native path
matters at scale (N=10M init: milliseconds vs ~minute).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnbody_host.so")

_lib = None
_load_attempted = False


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.nbody_glibc_rand_fill.argtypes = [
        ctypes.c_uint32, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
    lib.nbody_glibc_rand_fill.restype = None
    dptr = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.nbody_init.argtypes = [ctypes.c_uint32, ctypes.c_int64,
                               ctypes.c_int32, ctypes.c_int32,
                               dptr, dptr, dptr, dptr, dptr, dptr]
    lib.nbody_init.restype = None
    lib.nbody_ppm_blit.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64]
    lib.nbody_ppm_blit.restype = ctypes.c_int
    lib.nbody_format_state.argtypes = [
        ctypes.c_int64, dptr, dptr, dptr, dptr, dptr, dptr,
        ctypes.c_char_p, ctypes.c_int64]
    lib.nbody_format_state.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def nbody_init(n: int, xdim: int, ydim: int, seed: int):
    """Native reference init; returns (x, y, xv, yv, mass, radius) float64."""
    lib = load()
    assert lib is not None
    arrs = [np.empty(n, np.float64) for _ in range(6)]
    lib.nbody_init(seed, n, xdim, ydim, *arrs)
    x, y, xv, yv, mass, radius = arrs
    return x, y, xv, yv, mass, radius


def glibc_rand_fill(seed: int, n: int) -> np.ndarray:
    lib = load()
    assert lib is not None
    out = np.empty(n, np.int64)
    lib.nbody_glibc_rand_fill(seed, n, out)
    return out


def format_state_native(x, y, xf, yf, xv, yv) -> str | None:
    """Reference final-state printout via C snprintf (exact printf
    semantics); None when the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    n = x.shape[0]
    # %10.3f widens for huge magnitudes; 64 bytes/field is ample headroom.
    line_cap = 6 * 64
    buf = ctypes.create_string_buffer(n * line_cap + 1)
    args = [np.ascontiguousarray(a, np.float64)
            for a in (x, y, xf, yf, xv, yv)]
    nbytes = lib.nbody_format_state(n, *args, buf, line_cap)
    if nbytes < 0:
        return None
    return buf.raw[:nbytes].decode("ascii")


def ppm_blit(path: str, data_offset: int, pixels: np.ndarray) -> bool:
    lib = load()
    if lib is None:
        return False
    pixels = np.ascontiguousarray(pixels, np.uint8)
    rc = lib.nbody_ppm_blit(path.encode(), data_offset, pixels, pixels.size)
    return rc == 0
