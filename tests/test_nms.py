"""Fixed-shape NMS vs a transcription of torchvision's greedy algorithm."""

import jax.numpy as jnp
import numpy as np

from livecell_tpu.ops.nms import nms_fixed
from tests.test_boxes import np_box_iou, random_boxes


def greedy_nms(boxes, scores, thresh):
    """torchvision.ops.nms semantics: greedy by score, suppress IoU > t."""
    order = np.argsort(-scores, kind="stable")
    iou = np_box_iou(boxes, boxes)
    keep, alive = [], np.ones(len(boxes), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        alive[iou[i] > thresh] = False
        alive[i] = False
    return keep


def test_nms_matches_greedy(rng):
    boxes = random_boxes(rng, 60, size=100)
    scores = rng.uniform(size=60).astype(np.float32)
    want = greedy_nms(boxes, scores, 0.4)

    idx, valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.4, 60)
    got = np.asarray(idx)[np.asarray(valid)]
    assert got.tolist() == want


def test_nms_max_keep_truncates(rng):
    boxes = random_boxes(rng, 40, size=500)  # mostly disjoint
    scores = rng.uniform(size=40).astype(np.float32)
    want = greedy_nms(boxes, scores, 0.4)[:5]
    idx, valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.4, 5)
    assert np.asarray(valid).all()
    assert np.asarray(idx).tolist() == want


def test_nms_validity_mask(rng):
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 3,
                           valid=jnp.asarray([False, True, True]))
    got = np.asarray(idx)[np.asarray(valid)]
    assert got.tolist() == [1, 2]


def test_nms_all_invalid():
    boxes = np.zeros((4, 4), np.float32)
    scores = np.zeros(4, np.float32)
    _, valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 4,
                         valid=jnp.zeros(4, bool))
    assert not np.asarray(valid).any()


def test_nms_identical_boxes_keeps_one():
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (5, 1))
    scores = np.array([0.5, 0.9, 0.1, 0.7, 0.3], np.float32)
    idx, valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 5)
    got = np.asarray(idx)[np.asarray(valid)]
    assert got.tolist() == [1]


def test_nms_iterated_matches_greedy(rng):
    """nms_iterated converges to the exact greedy set on random dense
    boxes across score distributions and thresholds."""
    from livecell_tpu.ops.nms import nms_iterated

    for n, thresh in ((60, 0.4), (200, 0.7), (500, 0.5)):
        boxes = random_boxes(rng, n, size=120)
        scores = rng.uniform(size=n).astype(np.float32)
        want = greedy_nms(boxes, scores, thresh)
        idx, valid = nms_iterated(jnp.asarray(boxes), jnp.asarray(scores),
                                  thresh, n)
        got = np.asarray(idx)[np.asarray(valid)]
        assert sorted(got.tolist()) == sorted(want), (n, thresh)
        # Descending-score pick order like nms_fixed.
        assert (np.diff(scores[got]) <= 1e-7).all()


def test_nms_iterated_validity_and_truncation(rng):
    from livecell_tpu.ops.nms import nms_iterated

    boxes = random_boxes(rng, 80, size=100)
    scores = rng.uniform(size=80).astype(np.float32)
    valid = rng.uniform(size=80) > 0.3
    want = [i for i in greedy_nms(boxes[valid], scores[valid], 0.4)]
    want_ids = np.flatnonzero(valid)[want]
    idx, kval = nms_iterated(jnp.asarray(boxes), jnp.asarray(scores),
                             0.4, 80, valid=jnp.asarray(valid))
    got = np.asarray(idx)[np.asarray(kval)]
    assert sorted(got.tolist()) == sorted(want_ids.tolist())

    idx, kval = nms_iterated(jnp.asarray(boxes), jnp.asarray(scores),
                             0.4, 5)
    assert int(np.asarray(kval).sum()) <= 5
