"""Evaluation metrics — box IoU / precision / recall / F1.

Same definitions as the reference evaluate() (train_custom.py:104-170;
train_transfer.py carries a duplicate at 159-226): detections above a
0.5 score threshold are matched to GT by box IoU; a detection is a true
positive when its best IoU exceeds the IoU threshold; precision/recall
are averaged per image over images that have both predictions and GT;
F1 combines the two means.

The per-batch reduction is a single jitted computation over fixed-slot
detections; only nine scalars per batch cross to the host.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from livecell_tpu.models.detector import Detections
from livecell_tpu.ops.boxes import box_iou


@functools.partial(jax.jit, static_argnames=("score_thresh", "iou_thresh"))
def batch_eval_stats(det: Detections, gt_boxes: jnp.ndarray,
                     gt_valid: jnp.ndarray, batch_valid: jnp.ndarray,
                     score_thresh: float = 0.5, iou_thresh: float = 0.5
                     ) -> Dict[str, jnp.ndarray]:
    """Per-batch metric partial sums.

    Args:
      det: fixed-slot Detections for the batch.
      gt_boxes: [B, I, 4]; gt_valid: [B, I]; batch_valid: [B] (False for
        padded tail images of the final batch).
    """

    def per_image(boxes, scores, dvalid, gtb, gtv, bvalid):
        dvalid = dvalid & bvalid
        gtv = gtv & bvalid
        conf_sum = jnp.sum(scores * dvalid)
        conf_cnt = dvalid.sum()

        keep = dvalid & (scores > score_thresh)
        n_pred = keep.sum()
        n_gt = gtv.sum()

        iou = box_iou(boxes, gtb)
        iou = jnp.where(gtv[None, :], iou, -1.0)
        max_iou = jnp.where(keep, iou.max(axis=1), 0.0)

        both = (n_pred > 0) & (n_gt > 0)
        # Reference semantics (train_custom.py:141-151): every
        # prediction whose best IoU clears the threshold counts as a
        # true positive — several can match the same GT, so per-image
        # recall can exceed 1 on duplicate-heavy predictions. Kept for
        # parity; COCO AP (train/coco_eval.py) is the matched metric.
        tp = jnp.sum((max_iou > iou_thresh) & keep) * both
        iou_sum = jnp.sum(jnp.maximum(max_iou, 0.0) * keep) * both
        iou_cnt = n_pred * both
        precision = jnp.where(both, tp / jnp.maximum(n_pred, 1), 0.0)
        recall = jnp.where(both, tp / jnp.maximum(n_gt, 1), 0.0)
        return {
            "conf_sum": conf_sum, "conf_cnt": conf_cnt,
            "iou_sum": iou_sum, "iou_cnt": iou_cnt,
            "prec_sum": precision, "rec_sum": recall,
            "pr_cnt": both.astype(jnp.int32),
            "gt_cnt": n_gt, "pred_cnt": n_pred, "tp_cnt": tp,
        }

    stats = jax.vmap(per_image)(det.boxes, det.scores, det.valid,
                                gt_boxes, gt_valid, batch_valid)
    return jax.tree.map(lambda x: x.sum(axis=0), stats)


class MetricAccumulator:
    """Host-side accumulator matching the reference metric dict keys
    (train_custom.py:159-168)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    def update(self, stats: Dict[str, jnp.ndarray]):
        for k, v in stats.items():
            self.totals[k] = self.totals.get(k, 0.0) + float(v)

    def summary(self) -> Dict[str, float]:
        t = self.totals

        def div(a, b):
            return t.get(a, 0.0) / t[b] if t.get(b, 0) else 0.0

        mean_p = div("prec_sum", "pr_cnt")
        mean_r = div("rec_sum", "pr_cnt")
        f1 = (2 * mean_p * mean_r / (mean_p + mean_r)
              if (mean_p + mean_r) > 0 else 0.0)
        return {
            "mean_iou": div("iou_sum", "iou_cnt"),
            "mean_precision": mean_p,
            "mean_recall": mean_r,
            "f1_score": f1,
            "mean_confidence": div("conf_sum", "conf_cnt"),
            "total_gt_instances": int(t.get("gt_cnt", 0)),
            "total_pred_instances": int(t.get("pred_cnt", 0)),
            "total_true_positives": int(t.get("tp_cnt", 0)),
        }


def evaluate(eval_step, params, batch_stats, dataset, batch_size: int,
             score_thresh: float = 0.5, iou_thresh: float = 0.5
             ) -> Dict[str, float]:
    """Full-split evaluation (reference evaluate, train_custom.py:104-170)."""
    import jax.numpy as jnp

    acc = MetricAccumulator()
    for images, targets, bvalid in dataset.batches(batch_size):
        det = eval_step(params, batch_stats, jnp.asarray(images))
        stats = batch_eval_stats(
            det, jnp.asarray(targets["boxes"]),
            jnp.asarray(targets["valid"]), jnp.asarray(bvalid),
            score_thresh=score_thresh, iou_thresh=iou_thresh)
        acc.update(jax.tree.map(np.asarray, stats))
    return acc.summary()
