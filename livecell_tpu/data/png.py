"""Minimal fast PNG encoder for grayscale tiles.

PIL's PNG encoder runs its per-scanline filter heuristic inside the
zip encoder, which measures ~2x slower than straight zlib on this
host's microscopy-noise tiles (and produces slightly *larger* files:
filtering hurts on high-entropy data). The tiling preprocessor writes
thousands of tiles per dataset (reference preprocess_dataset.py:
229-240 writes 25 per source frame), so encode speed is the pipeline
bottleneck on a 1-core host.

This writer emits filter-type-0 scanlines compressed with zlib at a
caller-chosen level. Output is a standards-compliant 8-bit grayscale
PNG that PIL round-trips pixel-identically (tests/test_data.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    c = typ + data
    return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))


def encode_gray_png(arr: np.ndarray, compress_level: int = 1) -> bytes:
    """Encode a [H, W] uint8 array as an 8-bit grayscale PNG."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError(f"need [H, W] uint8, got {arr.shape} {arr.dtype}")
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    rows = np.zeros((h, w + 1), np.uint8)   # leading 0 = filter None
    rows[:, 1:] = arr
    idat = zlib.compress(rows.tobytes(), compress_level)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def write_gray_png(path, arr: np.ndarray, compress_level: int = 1) -> None:
    with open(path, "wb") as f:
        f.write(encode_gray_png(arr, compress_level))
