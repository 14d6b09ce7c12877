"""Evaluation metrics vs hand-computed reference semantics."""

import jax.numpy as jnp
import numpy as np

from livecell_tpu.models.detector import Detections
from livecell_tpu.train.metrics import MetricAccumulator, batch_eval_stats


def make_det(boxes, scores):
    d = len(boxes)
    return Detections(
        boxes=jnp.asarray(boxes, jnp.float32)[None],
        scores=jnp.asarray(scores, jnp.float32)[None],
        labels=jnp.ones((1, d), jnp.int32),
        valid=jnp.ones((1, d), bool),
        mask_probs=jnp.zeros((1, d, 28, 28)))


def test_batch_eval_stats_simple():
    det = make_det([[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]],
                   [0.9, 0.8, 0.3])
    gt = jnp.asarray([[[0, 0, 10, 10], [21, 21, 30, 30]]], jnp.float32)
    gtv = jnp.asarray([[True, True]])
    stats = batch_eval_stats(det, gt, gtv, jnp.asarray([True]))
    # score>0.5 keeps 2 preds; det0 IoU 1.0 (TP), det1 IoU ~0.68 (TP)
    assert int(stats["pred_cnt"]) == 2
    assert int(stats["gt_cnt"]) == 2
    assert int(stats["tp_cnt"]) == 2
    assert float(stats["prec_sum"]) == 1.0
    assert float(stats["rec_sum"]) == 1.0
    # mean confidence over all valid detections incl. the 0.3 one
    assert abs(float(stats["conf_sum"]) / float(stats["conf_cnt"])
               - np.mean([0.9, 0.8, 0.3])) < 1e-6


def test_batch_eval_stats_no_gt_skipped():
    det = make_det([[0, 0, 10, 10]], [0.9])
    gt = jnp.zeros((1, 2, 4))
    gtv = jnp.zeros((1, 2), bool)
    stats = batch_eval_stats(det, gt, gtv, jnp.asarray([True]))
    # Images without GT contribute preds but no precision/recall rows
    # (reference train_custom.py:138).
    assert int(stats["pr_cnt"]) == 0
    assert int(stats["pred_cnt"]) == 1


def test_batch_valid_masks_padded_images():
    det = make_det([[0, 0, 10, 10]], [0.9])
    gt = jnp.asarray([[[0, 0, 10, 10], [0, 0, 0, 0]]], jnp.float32)
    gtv = jnp.asarray([[True, False]])
    stats = batch_eval_stats(det, gt, gtv, jnp.asarray([False]))
    assert int(stats["pred_cnt"]) == 0
    assert int(stats["gt_cnt"]) == 0


def test_accumulator_f1():
    acc = MetricAccumulator()
    acc.update({"prec_sum": 0.5, "rec_sum": 1.0, "pr_cnt": 1,
                "iou_sum": 0.9, "iou_cnt": 1, "conf_sum": 0.9,
                "conf_cnt": 1, "gt_cnt": 2, "pred_cnt": 1, "tp_cnt": 1})
    s = acc.summary()
    assert abs(s["f1_score"] - (2 * 0.5 * 1.0 / 1.5)) < 1e-9
    assert s["mean_iou"] == 0.9
    assert s["total_gt_instances"] == 2
