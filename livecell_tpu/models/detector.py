"""Detection losses and postprocessing — pure static-shape functions.

Functional re-expressions of the reference loss/postprocess logic:
  * RPN objectness loss with balanced sampling (reference rpn.py:42-121)
  * box cls/reg losses (reference custom_maskrcnn.py:211-240)
  * mask BCE loss (reference custom_maskrcnn.py:242-263 +
    mask_utils.py:49-126)
  * inference detection filtering (reference custom_maskrcnn.py:179-207)

Reference quirks preserved deliberately (they define the model whose
metrics we compare against; each is flagged in comments):
  * RPN loss reads objectness of batch image 0 only, while anchors are
    matched against ground truth concatenated across the whole batch
    (rpn.py:53 indexes a flat [B*H*W*A] view with anchor-count-bounded
    indices; rpn.py:57-67 concatenates all targets).
  * proposals are raw anchors; RPN deltas are never decoded
    (proposal_utils.py:25,47).
  * box/mask heads train on batch image 0 only (custom_maskrcnn.py:108,
    120, 213, 244).

Ground-truth batches use fixed instance slots:
  targets = {
    'boxes':  [B, I, 4] f32 xyxy,
    'labels': [B, I] i32,
    'mask28': [B, I, 28, 28] f32 (GT-box-cropped mask targets; the
              reference extracts these from the dense GT mask at the
              *matched GT box*, mask_utils.py:107-112, so they are a pure
              per-instance precompute),
    'valid':  [B, I] bool,
  }
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from livecell_tpu.config import ModelConfig
from livecell_tpu.ops.boxes import box_iou, encode_boxes


def _rank_desc(x: jnp.ndarray) -> jnp.ndarray:
    """rank[i] = position of x[i] in descending sort order."""
    order = jnp.argsort(-x)
    return jnp.zeros_like(order).at[order].set(jnp.arange(x.shape[0]))


def _select_top(mask: jnp.ndarray, pri: jnp.ndarray, kmax: int,
                count: jnp.ndarray, approx: bool = False) -> jnp.ndarray:
    """mask & (pri among the `count` largest masked priorities).

    Threshold form of `mask & (_rank_desc(pri) < count)`: a value-only
    top_k replaces the argsort + scatter (the scatter alone was ~2.8 ms
    per image batch on the profile). Identical selection for distinct
    priorities (iid uniforms; a float32 tie at the threshold would admit
    one extra element with probability ~1e-5 per step). With
    approx=True the threshold comes from ApproxTopK (ops/topk.py) —
    the sample may fall marginally short of `count`, which the
    denominator-normalized losses absorb.
    """
    from livecell_tpu.ops.topk import top_k
    kmax = min(kmax, pri.shape[0])
    vals = top_k(jnp.where(mask, pri, -jnp.inf), kmax, approx=approx)[0]
    thr = vals[jnp.minimum(jnp.maximum(count, 1), kmax) - 1]
    return mask & (pri >= thr) & (count > 0)


def bce_with_logits(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def smooth_l1(x, y, beta: float = 1.0):
    d = jnp.abs(x - y)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def rpn_loss(
    cls_level0: jnp.ndarray,       # [B, H, W, A] logits
    anchors: jnp.ndarray,          # [N, 4]
    gt_boxes: jnp.ndarray,         # [B, I, 4]
    gt_valid: jnp.ndarray,         # [B, I]
    rng: jax.Array,
    cfg: ModelConfig,
) -> jnp.ndarray:
    """Balanced-sample objectness BCE (reference rpn.py:42-121).

    Reference quirk: flat indices into [B*H*W*A] never exceed N, so only
    image 0's scores are supervised, while GT comes concatenated from
    the whole batch."""
    scores = cls_level0[0].reshape(-1).astype(jnp.float32)  # [N]
    return rpn_loss_single(scores, anchors, gt_boxes.reshape(-1, 4),
                           gt_valid.reshape(-1), rng, cfg)


def rpn_loss_single(
    scores: jnp.ndarray,           # [N] flat objectness logits
    anchors: jnp.ndarray,          # [N, 4]
    boxes_all: jnp.ndarray,        # [M, 4]
    valid_all: jnp.ndarray,        # [M]
    rng: jax.Array,
    cfg: ModelConfig,
    max_iou: jnp.ndarray | None = None,  # [N] precomputed anchor max-IoU
) -> jnp.ndarray:
    n = anchors.shape[0]
    if max_iou is None:
        ious = box_iou(anchors, boxes_all)                   # [N, B*I]
        ious = jnp.where(valid_all[None, :], ious, -1.0)
        max_iou = ious.max(axis=1)

    pos = max_iou >= cfg.rpn_pos_iou
    neg = (max_iou < cfg.rpn_neg_iou) & (max_iou >= 0.0)
    # With no valid GT every iou is -1: no pos, no neg -> constant fallback.

    num_pos = jnp.minimum(pos.sum(), cfg.rpn_pos_per_image)
    num_neg = jnp.minimum(neg.sum(), cfg.rpn_batch_per_image - num_pos)

    kp, kn = jax.random.split(rng)
    pri_pos = jax.random.uniform(kp, (n,))
    pri_neg = jax.random.uniform(kn, (n,))
    from livecell_tpu.ops.topk import resolve_topk_approx
    approx = resolve_topk_approx(cfg.topk_backend)
    chosen_pos = _select_top(pos, pri_pos, cfg.rpn_pos_per_image, num_pos,
                             approx=approx)
    chosen_neg = _select_top(neg, pri_neg, cfg.rpn_batch_per_image,
                             num_neg, approx=approx)

    labels = chosen_pos.astype(jnp.float32)
    w = (chosen_pos | chosen_neg).astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)
    loss = (bce_with_logits(scores, labels) * w).sum() / denom

    has_gt = valid_all.any()
    has_sample = (num_pos + num_neg) > 0
    # No GT at all -> 0.1 (rpn.py:64); matching failed -> 0.1*mean
    # (rpn.py:120).
    return jnp.where(
        has_gt, jnp.where(has_sample, loss, 0.1 * scores.mean()), 0.1)


def rpn_reg_loss(
    deltas: jnp.ndarray,           # [N, 4] RPN box deltas
    anchors: jnp.ndarray,          # [N, 4]
    gt_boxes: jnp.ndarray,         # [M, 4]
    gt_valid: jnp.ndarray,         # [M]
    cfg: ModelConfig,
    ious: jnp.ndarray | None = None,  # [N, M] pre-masked IoU matrix
) -> jnp.ndarray:
    """Smooth-L1 delta regression on positive anchors.

    The reference defines no RPN box loss (its deltas are dead weight,
    SURVEY.md §2.1); this loss exists for the decode_proposals fixed
    mode so the decoded proposals are meaningful."""
    if ious is None:
        ious = box_iou(anchors, gt_boxes)
        ious = jnp.where(gt_valid[None, :], ious, -1.0)
    max_iou = ious.max(axis=1)
    matched = ious.argmax(axis=1)
    # Matched boxes via one-hot einsum: a [N,4] dynamic row gather runs
    # at ~7 GB/s effective on TPU (3.9 ms/step on the r3 trace) while
    # the one-hot contraction rides the MXU.
    onehot = jax.nn.one_hot(matched, gt_boxes.shape[0],
                            dtype=gt_boxes.dtype)
    targets = encode_boxes(onehot @ gt_boxes, anchors).T   # [4, N] planar
    best = ious.argmax(axis=0) if cfg.rpn_force_best_anchor else None
    return rpn_reg_loss_from_match(deltas, max_iou, targets,
                                   best, gt_valid, cfg)


def rpn_reg_loss_from_match(
    deltas: jnp.ndarray,           # [N*4] or [N,4] RPN box deltas
    max_iou: jnp.ndarray,          # [N] per-anchor max IoU (-1 masked)
    reg_targets: jnp.ndarray,      # [4, N] PLANAR encode(gt[argmax], ...)
    best_anchor: jnp.ndarray | None,  # [M] per-GT argmax anchor
    gt_valid: jnp.ndarray,         # [M]
    cfg: ModelConfig,
) -> jnp.ndarray:
    """rpn_reg_loss on precomputed matcher outputs (the fused Pallas
    matcher, ops/pallas_match.py, produces these without materializing
    the [N, M] IoU matrix or the matched boxes in HBM).

    The smooth-L1 runs on PLANAR [4, N] arrays: any [N, 4]-shaped
    tensor pads its minor dim 4 -> 128 lanes on TPU, so elementwise
    chains and relayout copies on that shape cost ~2 ms/step (r3
    traces). One transpose of the deltas is paid instead."""
    pos = max_iou >= cfg.rpn_pos_iou
    if cfg.rpn_force_best_anchor:
        # Every (valid) GT supervises its single best anchor even below
        # the positive gate, so no object is left without a trained
        # delta (torchvision allow_low_quality_matches).
        forced = jnp.zeros(max_iou.shape[0], jnp.int32)
        forced = forced.at[best_anchor].max(gt_valid.astype(jnp.int32))
        pos = pos | (forced > 0)
    pos = pos.astype(jnp.float32)

    d4 = deltas.reshape(-1, 4).T.astype(jnp.float32)     # [4, N] planar
    reg = smooth_l1(d4 - reg_targets, 0.0).sum(axis=0)   # [N]
    loss = (reg * pos).sum() / (4.0 * jnp.maximum(pos.sum(), 1.0))
    return jnp.where(gt_valid.any(), loss, 0.0)


class HeadTargets(NamedTuple):
    cls_labels: jnp.ndarray    # [K] int (0 bg / 1 fg)
    cls_weight: jnp.ndarray    # [K] float (proposal validity)
    reg_targets: jnp.ndarray   # [K, 4]
    reg_weight: jnp.ndarray    # [K] (box-fg mask)
    mask_targets: jnp.ndarray  # [K, 28, 28]
    mask_weight: jnp.ndarray   # [K] (mask-fg mask)


def match_head_targets(
    proposals: jnp.ndarray,    # [K, 4]
    prop_valid: jnp.ndarray,   # [K]
    gt_boxes: jnp.ndarray,     # [I, 4]
    gt_valid: jnp.ndarray,     # [I]
    gt_mask28: jnp.ndarray,    # [I, 28, 28]
    cfg: ModelConfig,
    mask_gt: tuple | None = None,
) -> HeadTargets:
    """IoU-match proposals to GT (single image — reference trains heads on
    batch element 0, custom_maskrcnn.py:213,244).

    mask_gt: optional (boxes [J,4], valid [J], mask28 [J,28,28]) used for
    *mask* matching only. The reference's quirk path selects mask
    foreground at IoU >= 0.4 vs image-0 GT (custom_maskrcnn.py:251) but
    then re-matches those proposals against GT concatenated across the
    WHOLE batch inside compute_mask_loss_from_gt (mask_utils.py:88-108),
    so the mask target can come from another image's instance. Pass the
    flattened batch GT here to reproduce that.
    """
    ious = box_iou(proposals, gt_boxes)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    max_iou = ious.max(axis=1)
    matched = ious.argmax(axis=1)

    fg_box = (max_iou >= cfg.box_fg_iou) & prop_valid

    matched_boxes = gt_boxes[matched]
    reg_targets = encode_boxes(matched_boxes, proposals)
    if cfg.decode_proposals:
        # Weighted box coding (see ModelConfig.box_reg_weights); the
        # inference decode divides by the same weights.
        reg_targets = reg_targets * jnp.asarray(cfg.box_reg_weights,
                                                reg_targets.dtype)

    # Mask matching: vs concatenated-batch GT when provided, with the
    # reference's inner > 0.3 check (mask_utils.py:97); the pre-filter at
    # IoU >= 0.4 vs image-0 GT makes the 0.3 check implied when both
    # matchings use the same GT set.
    if mask_gt is not None:
        mgtb, mgtv, mgtm = mask_gt
        mious = box_iou(proposals, mgtb)
        mious = jnp.where(mgtv[None, :], mious, -1.0)
        m_max = mious.max(axis=1)
        m_arg = mious.argmax(axis=1)
    else:
        m_max, m_arg, mgtm = max_iou, matched, gt_mask28
    fg_mask = fg_box & (m_max > cfg.mask_fg_iou)
    mask_targets = mgtm[m_arg]

    has_gt = gt_valid.any()
    return HeadTargets(
        cls_labels=fg_box.astype(jnp.int32),
        cls_weight=(prop_valid & has_gt).astype(jnp.float32),
        reg_targets=reg_targets,
        reg_weight=(fg_box & has_gt).astype(jnp.float32),
        mask_targets=mask_targets,
        mask_weight=(fg_mask & has_gt).astype(jnp.float32),
    )


def box_losses(cls_logits: jnp.ndarray, box_deltas: jnp.ndarray,
               t: HeadTargets, num_classes: int = 2
               ) -> Dict[str, jnp.ndarray]:
    """CE over all (valid) proposals + smooth-L1 on class-1 deltas over
    box-fg proposals (reference custom_maskrcnn.py:221-240)."""
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, t.cls_labels[:, None], axis=1)[:, 0]
    cls_loss = (ce * t.cls_weight).sum() / jnp.maximum(t.cls_weight.sum(), 1.0)

    # Reference slices class-1 deltas: box_regression[:, 4:8]
    # (custom_maskrcnn.py:234).
    fg_deltas = box_deltas[:, 4:8].astype(jnp.float32)
    reg = smooth_l1(fg_deltas, t.reg_targets).mean(axis=1)
    reg_loss = (reg * t.reg_weight).sum() / jnp.maximum(t.reg_weight.sum(), 1.0)
    reg_loss = jnp.where(t.reg_weight.sum() > 0, reg_loss, 0.0)
    return {"loss_box_cls": cls_loss, "loss_box_reg": reg_loss}


def mask_loss(mask_logits: jnp.ndarray, t: HeadTargets) -> jnp.ndarray:
    """BCE on class-1 mask logits over mask-fg proposals
    (reference mask_utils.py:117-126)."""
    return mask_loss_on(mask_logits, t.mask_targets, t.mask_weight)


def mask_loss_on(mask_logits: jnp.ndarray, mask_targets: jnp.ndarray,
                 mask_weight: jnp.ndarray) -> jnp.ndarray:
    """mask_loss on explicit (targets, weights) — used by the fixed-mode
    fg-subset path, where the mask head runs on a gathered subset of the
    sampled proposals instead of all of them."""
    logits1 = mask_logits[..., 1].astype(jnp.float32)       # [K, 28, 28]
    per = bce_with_logits(logits1, mask_targets).mean(axis=(1, 2))
    loss = (per * mask_weight).sum() / jnp.maximum(mask_weight.sum(), 1.0)
    return jnp.where(mask_weight.sum() > 0, loss, 0.0)


class Detections(NamedTuple):
    boxes: jnp.ndarray       # [B, D, 4]
    scores: jnp.ndarray      # [B, D]
    labels: jnp.ndarray      # [B, D] (1 = cell)
    valid: jnp.ndarray       # [B, D] bool
    mask_probs: jnp.ndarray  # [B, D, 28, 28] class-1 sigmoid probabilities
