"""Anchor generator parity with the reference conventions."""

import math

import numpy as np

from livecell_tpu.ops.anchors import generate_anchors


def test_base_anchor_convention():
    """size 32 / ratio 0.5 -> h = sqrt(1024/0.5), w = h*0.5 (the reference's
    width-carries-ratio quirk, anchor_generator.py:19-21)."""
    a = generate_anchors((1, 1), stride=4)
    assert a.shape == (9, 4)
    h = math.sqrt(32 * 32 / 0.5)
    w = h * 0.5
    np.testing.assert_allclose(a[0], [-w / 2, -h / 2, w / 2, h / 2], rtol=1e-6)
    # ratio 1.0 -> square
    np.testing.assert_allclose(a[1], [-16, -16, 16, 16], rtol=1e-6)


def test_grid_layout_shift_major():
    a = generate_anchors((2, 3), stride=4, sizes=(32,), ratios=(1.0,))
    assert a.shape == (6, 4)
    centers_x = (a[:, 0] + a[:, 2]) / 2
    centers_y = (a[:, 1] + a[:, 3]) / 2
    # Row-major over (y, x): x cycles fastest.
    np.testing.assert_allclose(centers_x, [0, 4, 8, 0, 4, 8])
    np.testing.assert_allclose(centers_y, [0, 0, 0, 4, 4, 4])


def test_full_scale_count():
    a = generate_anchors((56, 76), stride=4)
    assert a.shape == (56 * 76 * 9, 4)
    assert a.dtype == np.float32


def test_cache_returns_same_object():
    a1 = generate_anchors((8, 8), stride=4)
    a2 = generate_anchors((8, 8), stride=4)
    assert a1 is a2
