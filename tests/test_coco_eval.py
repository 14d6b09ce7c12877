"""COCO AP computation unit tests with hand-constructed cases."""

import numpy as np

from livecell_tpu.train.coco_eval import (
    average_precision, compute_ap, greedy_match)


def test_greedy_match_basic():
    scores = np.array([0.9, 0.8, 0.7])
    iou = np.array([[0.8, 0.0],
                    [0.75, 0.1],
                    [0.0, 0.6]])
    tp = greedy_match(scores, iou, 2, 0.5)
    # det0 takes gt0; det1's best (gt0) is taken -> FP; det2 takes gt1.
    assert tp.tolist() == [True, False, True]


def test_greedy_match_prefers_higher_iou():
    scores = np.array([0.9])
    iou = np.array([[0.55, 0.95]])
    tp = greedy_match(scores, iou, 2, 0.5)
    assert tp.tolist() == [True]


def test_average_precision_perfect():
    ap = average_precision(np.array([0.9, 0.8]), np.array([True, True]), 2)
    assert ap > 0.99


def test_average_precision_half():
    # One TP then one FP over 2 GT: recall caps at 0.5, precision 1 there.
    ap = average_precision(np.array([0.9, 0.8]),
                           np.array([True, False]), 2)
    assert 0.45 < ap < 0.55


def test_compute_ap_keys():
    per_image = [
        (np.array([0.9, 0.2]),
         np.array([[0.9, 0.0], [0.0, 0.85]]), 2),
        (np.array([]), np.zeros((0, 1)), 1),
    ]
    out = compute_ap(per_image)
    assert set(out) == {"AP", "AP50", "AP75"}
    assert 0 < out["AP"] <= 1
    assert out["AP50"] >= out["AP75"] >= 0
