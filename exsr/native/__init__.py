"""Native (C++) host-side kernels, loaded via ctypes.

Build happens lazily on first use (g++ -O3 -march=native shared object
cached next to the source).  Falls back cleanly to the pure-numpy path in
exsr.ops.resize when no compiler is available.

The native core accelerates the data pipeline's per-sample hot path —
on-the-fly CEM-consistent LR synthesis (separable edge-padded correlation +
integer-factor resampling) — replacing scipy's full 2-D convolve2d.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'separable_conv.cpp')
_SO = os.path.join(_HERE, '_separable_conv.so')
_lib = None
_build_failed = False


def build_shared_object(src: str, so: str) -> bool:
    """Lazy g++ build shared by every native module.

    Atomic: compiles to a per-process temp path then os.rename's into
    place, so a killed or concurrent build can never leave a
    half-written .so that passes the mtime check (two processes taking
    their first decode simultaneously both succeed)."""
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return True
    tmp = f'{so}.{os.getpid()}.tmp'
    try:
        subprocess.run(
            ['g++', '-O3', '-march=native', '-shared', '-fPIC',
             '-std=c++17', src, '-o', tmp],
            check=True, capture_output=True)
        os.replace(tmp, so)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def load_native_lib(src: str, so: str, configure) -> object | None:
    """Build (if needed) + CDLL + signature setup; None when unavailable.
    A CDLL failure (e.g. stale partial .so from an old non-atomic build)
    deletes the artifact and retries the build once."""
    if not build_shared_object(src, so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        try:
            os.unlink(so)
        except OSError:
            return None
        if not build_shared_object(src, so):
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
    configure(lib)
    return lib


def _build() -> bool:
    global _build_failed
    if build_shared_object(_SRC, _SO):
        return True
    _build_failed = True
    return False


def load():
    """The ctypes library, or None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if _build_failed or not _build():
        return None
    lib = ctypes.CDLL(_SO)
    dptr = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64
    lib.exsr_sepconv_edge.argtypes = [dptr, i64, i64, i64, dptr, i64,
                                      dptr, i64, dptr]
    lib.exsr_downscale.argtypes = [dptr, i64, i64, i64, dptr, i64, dptr,
                                   i64, i64, i64, i64, dptr]
    lib.exsr_upscale.argtypes = [dptr, i64, i64, i64, dptr, i64, dptr,
                                 i64, i64, i64, i64, dptr]
    _lib = lib
    return lib


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def available() -> bool:
    return load() is not None


def sepconv_edge(img: np.ndarray, kcol: np.ndarray, krow: np.ndarray
                 ) -> np.ndarray:
    """Edge-padded separable correlation of an HWC float64 image."""
    lib = load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float64)
    kcol = np.ascontiguousarray(kcol, np.float64)
    krow = np.ascontiguousarray(krow, np.float64)
    h, w, c = img.shape
    out = np.empty_like(img)
    lib.exsr_sepconv_edge(_as_c(img), h, w, c, _as_c(kcol), len(kcol),
                          _as_c(krow), len(krow), _as_c(out))
    return out


def downscale(img: np.ndarray, kcol: np.ndarray, krow: np.ndarray,
              f: int, pre: tuple[int, int]) -> np.ndarray:
    lib = load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float64)
    kcol = np.ascontiguousarray(kcol, np.float64)
    krow = np.ascontiguousarray(krow, np.float64)
    h, w, c = img.shape
    out = np.empty((h // f, w // f, c), np.float64)
    lib.exsr_downscale(_as_c(img), h, w, c, _as_c(kcol), len(kcol),
                       _as_c(krow), len(krow), f, pre[0], pre[1],
                       _as_c(out))
    return out


def upscale(img: np.ndarray, kcol: np.ndarray, krow: np.ndarray,
            f: int, pre: tuple[int, int]) -> np.ndarray:
    lib = load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float64)
    kcol = np.ascontiguousarray(kcol, np.float64)
    krow = np.ascontiguousarray(krow, np.float64)
    h, w, c = img.shape
    out = np.empty((h * f, w * f, c), np.float64)
    lib.exsr_upscale(_as_c(img), h, w, c, _as_c(kcol), len(kcol),
                     _as_c(krow), len(krow), f, pre[0], pre[1], _as_c(out))
    return out
