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


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def evaluate_coco(eval_step, params, batch_stats, dataset,
                  batch_size: int, iou_type: str = "segm",
                  max_dets: int = 100) -> Dict[str, float]:
    """Single-type wrapper over :func:`evaluate_coco_multi`."""
    return evaluate_coco_multi(eval_step, params, batch_stats, dataset,
                               batch_size, iou_types=(iou_type,),
                               max_dets=max_dets)[iou_type]


def evaluate_coco_multi(eval_step, params, batch_stats, dataset,
                        batch_size: int, iou_types=("segm", "bbox"),
                        max_dets: int = 100, box_metrics: bool = False,
                        score_thresh: float = 0.5,
                        iou_thresh: float = 0.5
                        ) -> Dict[str, Dict[str, float]]:
    """Run the detector ONCE over a split and compute COCO AP for every
    requested IoU type ('segm' pastes masks and uses mask IoU — the
    BASELINE headline; 'bbox' uses box IoU).

    TPU-tunnel-aware design (the detector may sit behind a remote
    device): GT masks ship to the device bit-packed (8x smaller) and
    are unpacked in-kernel; paste->IoU is one fused jitted call whose
    only fetch is the [D, G] IoU matrix (the pasted [D, H, W] masks
    never leave the device); GT counts are bucketed to multiples of 32
    so the fused program compiles a handful of times per split instead
    of once per distinct (n_det, n_gt) pair.

    With ``box_metrics=True`` the same detector pass also accumulates
    the reference box IoU/P/R/F1 metrics (train/metrics.py), returned
    under key ``"box_metrics"`` — one sweep instead of three.
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
    coco = CocoIndex(dataset.ann_file) if "segm" in iou_types else None

    @jax.jit
    def fused_mask_iou(probs, boxes, valid, gpacked):
        # gpacked: [G, th, ceil(tw/8)] uint8, numpy packbits order
        # (bitorder='big' -> MSB first).
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        bits = (gpacked[..., None] >> shifts) & jnp.uint8(1)
        gmasks = bits.reshape(gpacked.shape[0], th, -1)[:, :, :tw]
        full = paste_masks(probs, boxes,
                           (mcfg.image_height, mcfg.image_width),
                           valid=valid)
        return mask_iou_matrix(full[:, :th, :tw] > 0, gmasks)

    @jax.jit
    def box_iou_fn(dboxes, gboxes):
        return box_iou(dboxes, gboxes)

    if box_metrics:
        from livecell_tpu.train.metrics import (MetricAccumulator,
                                                batch_eval_stats)
        acc = MetricAccumulator()

    per_image = {t: [] for t in iou_types}
    idx_cursor = 0
    for images, targets, bvalid in dataset.batches(batch_size):
        det = eval_step(params, batch_stats, jnp.asarray(images))
        if box_metrics:
            stats = batch_eval_stats(
                det, jnp.asarray(targets["boxes"]),
                jnp.asarray(targets["valid"]), jnp.asarray(bvalid),
                score_thresh=score_thresh, iou_thresh=iou_thresh)
            acc.update(jax.tree.map(np.asarray, stats))
        h_scores = np.asarray(det.scores)
        h_valid = np.asarray(det.valid)
        h_boxes = np.asarray(det.boxes)
        for bi in range(images.shape[0]):
            if not bvalid[bi]:
                continue
            tile_idx = idx_cursor
            idx_cursor += 1
            valid = h_valid[bi]
            scores = h_scores[bi][valid]
            lo, hi = dataset.offsets[tile_idx], dataset.offsets[tile_idx + 1]
            n_gt = int(hi - lo)
            if len(scores) == 0 or n_gt == 0:
                for t in iou_types:
                    per_image[t].append(
                        (scores, np.zeros((len(scores), n_gt)), n_gt))
                continue
            order = np.argsort(-scores)[:max_dets]
            gpad = _round_up(n_gt, 32)
            if "bbox" in iou_types:
                gboxes = np.zeros((gpad, 4), np.float32)
                gboxes[:n_gt] = dataset.boxes[lo:hi]
                iou = np.asarray(box_iou_fn(
                    jnp.asarray(h_boxes[bi]),
                    jnp.asarray(gboxes)))[valid][:, :n_gt]
                per_image["bbox"].append((scores[order], iou[order], n_gt))
            if "segm" in iou_types:
                # GT rasterization cached on the dataset (bit-packed;
                # a split is re-evaluated every epoch). Key includes
                # (th, tw): the same dataset object can be evaluated
                # under model configs with different input sizes, and
                # masks rasterized at one size must not be unpacked at
                # another (ADVICE r3).
                gcache = getattr(dataset, "_gt_mask_cache", None)
                if gcache is None:
                    gcache = {}
                    dataset._gt_mask_cache = gcache
                ckey = (tile_idx, th, tw)
                if ckey not in gcache:
                    img_id = int(dataset.image_ids[tile_idx])
                    gmasks = np.stack([
                        ann_to_mask(a, th, tw)
                        for a in coco.get_anns(img_id)
                        if not a.get("iscrowd", 0)])
                    gcache[ckey] = np.packbits(
                        gmasks.astype(np.uint8), axis=-1)
                packed = gcache[ckey]
                gpacked = np.zeros((gpad,) + packed.shape[1:], np.uint8)
                gpacked[:n_gt] = packed
                iou = np.asarray(fused_mask_iou(
                    det.mask_probs[bi], det.boxes[bi], det.valid[bi],
                    jnp.asarray(gpacked)))[valid][:, :n_gt]
                per_image["segm"].append((scores[order], iou[order], n_gt))
    out = {t: compute_ap(per_image[t]) for t in iou_types}
    if box_metrics:
        out["box_metrics"] = acc.summary()
    return out
