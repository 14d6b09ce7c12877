"""Static-shape proposal selection semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from livecell_tpu.ops.anchors import generate_anchors
from livecell_tpu.ops.proposals import (
    inference_proposals, sample_rows, training_proposals)


def test_sample_rows_uniform_subset():
    valid = jnp.asarray([True, False, True, True, False, True])
    idx, mask = sample_rows(jax.random.key(0), valid, 3)
    assert mask.all()
    assert set(np.asarray(idx).tolist()) <= {0, 2, 3, 5}
    assert len(set(np.asarray(idx).tolist())) == 3


def test_sample_rows_fewer_valid_than_k():
    valid = jnp.asarray([False, True, False])
    idx, mask = sample_rows(jax.random.key(1), valid, 4)
    m = np.asarray(mask)
    assert m.sum() == 1
    assert np.asarray(idx)[m].tolist() == [1]


def _fake_objectness(anchors, hot_boxes, a):
    """High logits for anchors near hot boxes, low elsewhere."""
    obj = np.full((a,), -6.0, np.float32)
    for hb in hot_boxes:
        d = np.abs((anchors[:, 0] + anchors[:, 2]) / 2 - (hb[0] + hb[2]) / 2) \
            + np.abs((anchors[:, 1] + anchors[:, 3]) / 2 - (hb[1] + hb[3]) / 2)
        obj = np.maximum(obj, 5.0 - d.astype(np.float32))
    return obj


def test_training_proposals_static_shapes():
    anchors = jnp.asarray(generate_anchors((14, 19), stride=4))
    a = anchors.shape[0]
    obj = jnp.asarray(_fake_objectness(np.asarray(anchors),
                                       [[20, 20, 50, 50]], a))
    p = training_proposals(obj, anchors, (56, 76), jax.random.key(0))
    assert p.boxes.shape == (128, 4)
    assert p.valid.shape == (128,)
    boxes = np.asarray(p.boxes)[np.asarray(p.valid)]
    # clipped to image
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= 76).all()
    assert (boxes[:, 1] >= 0).all() and (boxes[:, 3] <= 56).all()
    # min size 5
    assert ((boxes[:, 2] - boxes[:, 0]) >= 5).all()
    assert ((boxes[:, 3] - boxes[:, 1]) >= 5).all()


def test_inference_proposals_nms_and_caps():
    anchors = jnp.asarray(generate_anchors((14, 19), stride=4))
    a = anchors.shape[0]
    obj = jnp.asarray(_fake_objectness(
        np.asarray(anchors), [[20, 20, 50, 50], [60, 30, 70, 44]], a))
    p = inference_proposals(obj, anchors, (56, 76))
    assert p.boxes.shape == (50, 4)
    vb = np.asarray(p.boxes)[np.asarray(p.valid)]
    vs = np.asarray(p.scores)[np.asarray(p.valid)]
    assert len(vb) > 0
    # scores pass the 0.3 threshold and come out in greedy (descending) order
    assert (vs > 0.3).all()
    assert (np.diff(vs) <= 1e-6).all()
    # pairwise IoU of survivors <= nms threshold
    from tests.test_boxes import np_box_iou
    iou = np_box_iou(vb, vb)
    np.fill_diagonal(iou, 0)
    assert (iou <= 0.4 + 1e-6).all()


def test_inference_proposals_no_candidates():
    anchors = jnp.asarray(generate_anchors((8, 8), stride=4))
    obj = jnp.full((anchors.shape[0],), -10.0)
    p = inference_proposals(obj, anchors, (32, 32))
    assert not np.asarray(p.valid).any()
