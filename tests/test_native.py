"""Native C++ kernels agree with the numpy implementations."""

import numpy as np
import pytest

native = pytest.importorskip("livecell_tpu.native")

if native.rasterize_polygon_native is None:
    pytest.skip("native extension unavailable", allow_module_level=True)

from livecell_tpu.data.coco import _rasterize_one, rle_decode, rle_encode


def test_rasterize_matches_numpy(rng):
    for _ in range(10):
        n = rng.integers(3, 12)
        poly = rng.uniform(0, 40, size=2 * n)
        a = native.rasterize_polygon_native(poly, 45, 50)
        b = _rasterize_one(np.asarray(poly), 45, 50)
        assert (a == b).all()


def test_rle_decode_matches_numpy(rng):
    mask = (rng.uniform(size=(33, 27)) > 0.6).astype(np.uint8)
    enc = rle_encode(mask)
    a = native.rle_decode_native(np.asarray(enc["counts"]), 33, 27)
    assert (a == mask).all()


def test_rle_encode_roundtrip(rng):
    mask = (rng.uniform(size=(21, 19)) > 0.4).astype(np.uint8)
    counts = native.rle_encode_native(mask)
    back = native.rle_decode_native(counts, 21, 19)
    assert (back == mask).all()
    assert counts.tolist() == rle_encode(mask)["counts"] or \
        [0] + counts.tolist() == rle_encode(mask)["counts"]


def test_rasterize_speed(rng):
    import time

    poly = rng.uniform(0, 290, size=32)
    t0 = time.perf_counter()
    for _ in range(200):
        native.rasterize_polygon_native(poly, 222, 300)
    native_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        _rasterize_one(np.asarray(poly), 222, 300)
    numpy_dt = (time.perf_counter() - t0) * 10
    # The C++ path should win clearly on the real tile size.
    assert native_dt < numpy_dt
