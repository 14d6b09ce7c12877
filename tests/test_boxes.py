"""Golden tests for box geometry ops against independent references."""

import jax.numpy as jnp
import numpy as np
import pytest

from livecell_tpu.ops.boxes import (
    box_iou, clip_boxes, decode_boxes, encode_boxes, small_box_mask)


def np_box_iou(a, b):
    """Independent numpy IoU (torchvision.ops.box_iou semantics)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    out = np.zeros((len(a), len(b)))
    for i in range(len(a)):
        for j in range(len(b)):
            x1 = max(a[i, 0], b[j, 0]); y1 = max(a[i, 1], b[j, 1])
            x2 = min(a[i, 2], b[j, 2]); y2 = min(a[i, 3], b[j, 3])
            inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
            u = area_a[i] + area_b[j] - inter
            out[i, j] = inter / u if u > 0 else 0.0
    return out


def random_boxes(rng, n, size=200):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def test_box_iou_matches_numpy(rng):
    a = random_boxes(rng, 17)
    b = random_boxes(rng, 9)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_box_iou(a, b), rtol=1e-5, atol=1e-6)


def test_box_iou_degenerate_boxes_zero():
    a = jnp.asarray([[0.0, 0, 0, 0], [5, 5, 5, 9]])
    b = jnp.asarray([[0.0, 0, 10, 10]])
    got = np.asarray(box_iou(a, b))
    assert (got == 0).all()


def test_encode_matches_reference_formula(rng):
    boxes = random_boxes(rng, 12)
    anchors = random_boxes(rng, 12)
    got = np.asarray(encode_boxes(jnp.asarray(boxes), jnp.asarray(anchors)))

    aw = np.clip(anchors[:, 2] - anchors[:, 0], 1.0, None)
    ah = np.clip(anchors[:, 3] - anchors[:, 1], 1.0, None)
    bw = np.clip(boxes[:, 2] - boxes[:, 0], 1.0, None)
    bh = np.clip(boxes[:, 3] - boxes[:, 1], 1.0, None)
    dx = ((boxes[:, 0] + boxes[:, 2]) / 2 - (anchors[:, 0] + anchors[:, 2]) / 2) / aw
    dy = ((boxes[:, 1] + boxes[:, 3]) / 2 - (anchors[:, 1] + anchors[:, 3]) / 2) / ah
    want = np.stack([dx, dy, np.log(bw / aw), np.log(bh / ah)], 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_encode_decode_roundtrip(rng):
    boxes = random_boxes(rng, 20)
    anchors = random_boxes(rng, 20)
    deltas = encode_boxes(jnp.asarray(boxes), jnp.asarray(anchors))
    back = np.asarray(decode_boxes(deltas, jnp.asarray(anchors)))
    # Round-trips exactly for boxes with sides >= 1 (all generated ones).
    np.testing.assert_allclose(back, boxes, rtol=1e-4, atol=1e-3)


def test_clip_boxes():
    b = jnp.asarray([[-5.0, -3.0, 400.0, 250.0], [10, 10, 20, 20]])
    got = np.asarray(clip_boxes(b, (222, 300)))
    np.testing.assert_allclose(got, [[0, 0, 300, 222], [10, 10, 20, 20]])


@pytest.mark.parametrize("min_size,expect", [(5.0, [True, False, False]),
                                             (1.0, [True, True, False])])
def test_small_box_mask(min_size, expect):
    b = jnp.asarray([[0.0, 0, 10, 10], [0, 0, 3, 8], [0, 0, 0.5, 9]])
    got = np.asarray(small_box_mask(b, min_size))
    assert got.tolist() == expect
