"""COCO-style mask/box AP evaluation.

The BASELINE metric for this framework is LIVECell mask AP; the
reference never computes AP (its evaluate() is box P/R/F1 only,
train_custom.py:104-170), so this module implements the COCO protocol
directly (pycocotools is absent in this image):

  * per image, an IoU matrix between detections and GT (mask IoU via a
    single device einsum over pasted masks, or box IoU),
  * greedy score-ordered matching per IoU threshold,
  * 101-point interpolated AP averaged over thresholds .50:.05:.95.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def mask_iou_matrix(det_masks, gt_masks):
    """[D, H, W] x [I, H, W] binary -> [D, I] IoU via one einsum."""
    import jax.numpy as jnp

    d = det_masks.reshape(det_masks.shape[0], -1).astype(jnp.float32)
    g = gt_masks.reshape(gt_masks.shape[0], -1).astype(jnp.float32)
    inter = d @ g.T
    area_d = d.sum(axis=1)[:, None]
    area_g = g.sum(axis=1)[None, :]
    union = area_d + area_g - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def greedy_match(scores: np.ndarray, iou: np.ndarray, n_gt: int,
                 thresh: float) -> np.ndarray:
    """COCO per-image matching: detections in descending score order
    claim the highest-IoU unmatched GT above thresh. Returns tp flags."""
    return greedy_match_all(scores, iou, n_gt,
                            np.asarray([thresh]))[0]


def greedy_match_all(scores: np.ndarray, iou: np.ndarray, n_gt: int,
                     threshs: np.ndarray) -> np.ndarray:
    """Vectorized greedy matching for ALL thresholds in one detection
    sweep: per detection, a [T, G] candidate matrix picks each
    threshold's best unmatched GT (ties resolved to the last GT index,
    matching the original scalar loop's `>=` update rule).

    Returns tp flags [T, D].
    """
    order = np.argsort(-scores, kind="stable")
    t = len(threshs)
    d_n = len(scores)
    tp = np.zeros((t, d_n), bool)
    if n_gt == 0 or d_n == 0:
        return tp
    taken = np.zeros((t, n_gt), bool)
    iou_m = np.asarray(iou)[:, :n_gt]
    tcol = np.asarray(threshs)
    rows = np.arange(t)
    for d in order:
        cand = np.where(taken, -1.0, iou_m[d][None, :])   # [T, G]
        gi = n_gt - 1 - np.argmax(cand[:, ::-1], axis=1)  # last max
        ok = cand[rows, gi] >= tcol
        taken[ok, gi[ok]] = True
        tp[ok, d] = True
    return tp


def average_precision(all_scores: np.ndarray, all_tp: np.ndarray,
                      total_gt: int) -> float:
    """101-point interpolated AP."""
    if total_gt == 0 or len(all_scores) == 0:
        return 0.0
    order = np.argsort(-all_scores, kind="stable")
    tp = all_tp[order]
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(~tp)
    recall = cum_tp / total_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1)
    # precision envelope
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(
        idx, len(precision) - 1)], 0.0)
    prec_at[idx >= len(precision)] = 0.0
    return float(prec_at.mean())


def compute_ap(per_image: List[Tuple[np.ndarray, np.ndarray, int]]
               ) -> Dict[str, float]:
    """per_image: list of (scores [D], iou [D, n_gt], n_gt).

    Returns AP (mean over thresholds), AP50, AP75.
    """
    total_gt = sum(n_gt for _, _, n_gt in per_image)
    scores_all = [s for s, _, _ in per_image if len(s)]
    tp_rows = [greedy_match_all(scores, iou, n_gt, IOU_THRESHOLDS)
               for scores, iou, n_gt in per_image if len(scores)]

    aps = {}
    for ti, t in enumerate(IOU_THRESHOLDS):
        if scores_all:
            ap = average_precision(
                np.concatenate(scores_all),
                np.concatenate([tp[ti] for tp in tp_rows]), total_gt)
        else:
            ap = 0.0
        aps[round(float(t), 2)] = ap
    return {
        "AP": float(np.mean(list(aps.values()))),
        "AP50": aps[0.5],
        "AP75": aps[0.75],
    }


def evaluate_coco(eval_step, params, batch_stats, dataset,
                  batch_size: int, iou_type: str = "segm",
                  max_dets: int = 100) -> Dict[str, float]:
    """Run the detector over a split and compute COCO AP.

    iou_type 'segm' pastes masks and uses mask IoU (the BASELINE
    headline); 'bbox' uses box IoU.
    """
    import jax
    import jax.numpy as jnp

    from livecell_tpu.data.coco import ann_to_mask, CocoIndex
    from livecell_tpu.ops.boxes import box_iou
    from livecell_tpu.ops.mask_ops import paste_masks

    mcfg = dataset.cfg
    # Evaluate in the region both frames share: detections live on the
    # model-input grid (image_height/width, to which gather pads OR
    # crops the stored tiles), GT annotations on the stored-tile grid.
    # Equal for the production configs (tile <= padded input); a model
    # input smaller than the tile (reduced-scale tests) crops the GT.
    th = min(dataset.tile_hw[0], mcfg.image_height)
    tw = min(dataset.tile_hw[1], mcfg.image_width)
    coco = CocoIndex(dataset.ann_file) if iou_type == "segm" else None

    @jax.jit
    def det_masks_fn(probs, boxes, valid):
        full = paste_masks(probs, boxes,
                           (mcfg.image_height, mcfg.image_width),
                           valid=valid)
        return full[:, :th, :tw] > 0

    @functools.partial(jax.jit, static_argnames=("n_gt",))
    def mask_iou_fn(dmasks, gmasks, n_gt):
        return mask_iou_matrix(dmasks, gmasks)

    per_image = []
    idx_cursor = 0
    for images, targets, bvalid in dataset.batches(batch_size):
        det = eval_step(params, batch_stats, jnp.asarray(images))
        det = jax.tree.map(np.asarray, det)
        for bi in range(images.shape[0]):
            if not bvalid[bi]:
                continue
            tile_idx = idx_cursor
            idx_cursor += 1
            valid = det.valid[bi]
            scores = det.scores[bi][valid]
            boxes = det.boxes[bi][valid]
            lo, hi = dataset.offsets[tile_idx], dataset.offsets[tile_idx + 1]
            n_gt = int(hi - lo)
            if len(scores) == 0 or n_gt == 0:
                per_image.append((scores, np.zeros((len(scores), n_gt)),
                                  n_gt))
                continue
            if iou_type == "bbox":
                iou = np.asarray(box_iou(jnp.asarray(boxes),
                                         jnp.asarray(dataset.boxes[lo:hi])))
            else:
                # GT rasterization cached on the dataset (bit-packed;
                # a split is re-evaluated every epoch).
                gcache = getattr(dataset, "_gt_mask_cache", None)
                if gcache is None:
                    gcache = {}
                    dataset._gt_mask_cache = gcache
                # Key includes (th, tw): the same dataset object can be
                # evaluated under model configs with different input
                # sizes, and masks rasterized at one size must not be
                # unpacked at another (ADVICE r3).
                ckey = (tile_idx, th, tw)
                if ckey in gcache:
                    gmasks = np.unpackbits(
                        gcache[ckey], axis=-1,
                        count=tw).astype(bool)
                else:
                    img_id = int(dataset.image_ids[tile_idx])
                    gmasks = np.stack([
                        ann_to_mask(a, th, tw)
                        for a in coco.get_anns(img_id)
                        if not a.get("iscrowd", 0)])
                    gcache[ckey] = np.packbits(
                        gmasks.astype(np.uint8), axis=-1)
                dmasks = det_masks_fn(
                    jnp.asarray(det.mask_probs[bi]),
                    jnp.asarray(det.boxes[bi]), jnp.asarray(det.valid[bi]))
                dmasks = np.asarray(dmasks)[valid]
                iou = np.asarray(mask_iou_fn(
                    jnp.asarray(dmasks), jnp.asarray(gmasks),
                    gmasks.shape[0]))
            order = np.argsort(-scores)[:max_dets]
            per_image.append((scores[order], iou[order], n_gt))
    return compute_ap(per_image)
