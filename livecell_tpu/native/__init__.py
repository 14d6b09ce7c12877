"""Native host-side data-path kernels (ctypes bindings).

Builds lazily with g++ on first import if the shared object is missing;
falls back silently to the numpy implementations in data/coco.py when a
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_native.so")
_SRC = os.path.join(_DIR, "rasterize.cc")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


_lib = None
if os.path.exists(_SO) or _build():
    try:
        _lib = ctypes.CDLL(_SO)
        _lib.rasterize_polygon.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        _lib.rle_decode.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        _lib.rle_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64)]
        _lib.rle_encode.restype = ctypes.c_int
    except Exception:
        _lib = None


def rasterize_polygon_native(poly: np.ndarray, h: int, w: int
                             ) -> np.ndarray:
    """Even-odd scanline fill of one flat-coord polygon -> uint8 [h, w]."""
    poly = np.ascontiguousarray(poly, np.float64)
    out = np.zeros((h, w), np.uint8)
    _lib.rasterize_polygon(
        poly.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(poly) // 2, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def rle_decode_native(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    counts = np.ascontiguousarray(counts, np.int64)
    out = np.zeros((h, w), np.uint8)
    _lib.rle_decode(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(counts), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def rle_encode_native(mask: np.ndarray) -> np.ndarray:
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    counts = np.zeros(h * w + 1, np.int64)
    n = _lib.rle_encode(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return counts[:n]


if _lib is None:  # pragma: no cover - toolchain missing
    rasterize_polygon_native = None  # type: ignore # noqa: F811
    rle_decode_native = None  # type: ignore # noqa: F811
    rle_encode_native = None  # type: ignore # noqa: F811
