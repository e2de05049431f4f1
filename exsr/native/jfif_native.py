"""ctypes loader for the native baseline-JPEG scan decoder
(jfif_scan.cpp) — the bit-serial hot loop of exsr/jpeg/jfif.py.

Lazy g++ build cached next to the source; ``available()`` is False (and
the Python decoder takes over) when no compiler is present.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

from exsr.native import load_native_lib

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'jfif_scan.cpp')
_SO = os.path.join(_HERE, '_jfif_scan.so')
_lib = None
_load_failed = False


def _configure(lib):
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.exsr_jfif_decode_scan.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        i32p, i32p, u8p, u8p, u8p, u8p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(i32p)]
    lib.exsr_jfif_decode_scan.restype = ctypes.c_int


def load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    _lib = load_native_lib(_SRC, _SO, _configure)
    _load_failed = _lib is None
    return _lib


def available() -> bool:
    return load() is not None


def decode_scan(data: bytes, pos: int, comp_h, comp_v,
                dc_tables, ac_tables, mcus_x: int, mcus_y: int,
                restart_interval: int, planes: list[np.ndarray]) -> int:
    """Run the native scan loop.

    ``dc_tables``/``ac_tables``: per scan-component (counts[16],
    symbols[<=256]) pairs.  ``planes``: per-component zeroed int32
    [bh, bw, 64] arrays filled in natural coefficient order.  Returns the
    C error code (0 = ok, 1 = bad Huffman code, 2 = AC overrun,
    3 = missing restart marker).
    """
    lib = load()
    assert lib is not None
    n = len(comp_h)
    buf = np.frombuffer(data, np.uint8)
    ch = np.ascontiguousarray(comp_h, np.int32)
    cv = np.ascontiguousarray(comp_v, np.int32)

    def pack(tables):
        counts = np.zeros((n, 16), np.uint8)
        syms = np.zeros((n, 256), np.uint8)
        for i, (c, s) in enumerate(tables):
            counts[i, :len(c)] = c
            syms[i, :len(s)] = s
        return counts, syms
    dcc, dcs = pack(dc_tables)
    acc, acs = pack(ac_tables)
    i32p = ctypes.POINTER(ctypes.c_int32)
    plane_ptrs = (i32p * n)(*[p.ctypes.data_as(i32p) for p in planes])

    def u8(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    return lib.exsr_jfif_decode_scan(
        u8(buf), len(data), pos, n,
        ch.ctypes.data_as(i32p), cv.ctypes.data_as(i32p),
        u8(dcc), u8(dcs), u8(acc), u8(acs),
        mcus_x, mcus_y, restart_interval, plane_ptrs)
