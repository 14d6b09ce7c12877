"""Transfer Mask R-CNN: torchvision `maskrcnn_resnet50_fpn` rebuilt
TPU-first.

The reference wraps the stock torchvision detector and swaps its
predictors for 2 classes (reference train_transfer.py:20-37). That stack
(GeneralizedRCNNTransform, AnchorGenerator, RegionProposalNetwork,
RoIHeads) is dynamic-shaped and per-image-looped end to end, so here it
is re-derived as one statically-shaped jittable graph:

  * transform: ImageNet normalize + bilinear resize to the 800-scale
    canvas + right-pad (GeneralizedRCNNTransform semantics),
  * ResNet-50 FPN backbone with the P6 maxpool level,
  * RPN over 5 levels, one anchor size per level x 3 ratios, per-level
    top-k + level-wise NMS with static slots and validity masks,
  * RoI heads with torchvision's matching/sampling rules (fg IoU 0.5,
    512 proposals @ 25% positive; GT boxes appended to proposals), the
    (10,10,5,5)-weighted box coder, and a mask branch on 14x14 ROIs,
  * MultiScaleRoIAlign as a single flattened-pyramid gather
    (ops/roi_align.py:multiscale_roi_align).

Deviations (documented, all shape-static by design): sampling uses fixed
fg/bg slot splits with validity masks instead of dynamic refill, the
same proposal counts serve train and eval.

Loss names match torchvision's dict: loss_objectness, loss_rpn_box_reg,
loss_classifier, loss_box_reg, loss_mask.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from livecell_tpu.models.detector import (
    Detections, bce_with_logits, smooth_l1)
from livecell_tpu.models.fpn import FPN
from livecell_tpu.models.init import (
    kaiming_normal_fan_out, normal_std, torch_default_bias,
    torch_default_kernel, zeros)
from livecell_tpu.models.resnet import ResNetBackbone
from livecell_tpu.models.rpn import RPNHead
from livecell_tpu.ops.boxes import (
    box_iou, clip_boxes, decode_boxes, small_box_mask)
from livecell_tpu.ops.mask_ops import reproject_mask28, resize_bilinear
from livecell_tpu.ops.nms import nms_fixed, nms_iterated
from livecell_tpu.ops.proposals import sample_rows
from livecell_tpu.ops.roi_align import multiscale_roi_align


@dataclasses.dataclass(frozen=True)
class TransferConfig:
    """Static hyperparameters of the transfer stack. Defaults follow
    torchvision maskrcnn_resnet50_fpn (the reference's pretrained=True
    model, train_transfer.py:22) at the LIVECell tile shape."""

    num_classes: int = 2

    # Input tile (the padded LIVECell tile fed by PackedDataset) and the
    # torchvision-transform canvas: min side resized to ~800
    # (GeneralizedRCNNTransform min_size), width padded to a multiple of
    # 32 like torchvision's batch padding.
    tile_height: int = 224
    tile_width: int = 304
    image_height: int = 800
    resized_width: int = 1086
    image_width: int = 1088

    max_instances: int = 128
    mask_size: int = 28
    mask_roi_size: int = 14
    roi_size: int = 7

    # Anchors: one size per pyramid level x 3 ratios (torchvision
    # AnchorGenerator defaults for detection).
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    level_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)

    # RPN (torchvision defaults; one top-k serves train and eval).
    rpn_pre_topk_per_level: int = 1000
    rpn_post_nms: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_min_size: float = 1e-3
    # Proposal-NMS algorithm: "sweep" solves the greedy recurrence by
    # iterated [N,N] matrix sweeps (ops/nms.py:nms_iterated — exact at
    # convergence, ~6 matrix passes); "scan" is the sequential
    # 1000-iteration fori_loop (nms_fixed). The five per-level scans
    # were the dominant non-conv cost of the transfer train step.
    rpn_nms_mode: str = "sweep"
    # MultiScaleRoIAlign backend: "pallas" = per-level dense
    # composition on the fused single-level kernel (ops/pallas_ms_roi
    # .py — every ROI pools from every level, lane-wide level select;
    # replaces ~1.6M scattered corner-gathers per image, 6.5x the
    # train step on chip); "xla" = the flat-buffer gather formulation;
    # "auto" = pallas on TPU hardware.
    roi_backend: str = "auto"
    # Anchor-GT matcher: "pallas" streams IoU tiles through VMEM
    # (ops/pallas_match.py) instead of materializing the [B, 217k, I]
    # matrix in HBM; "xla" is the dense formulation; "auto" = pallas on
    # TPU hardware. Semantics note: the pallas path takes each GT's
    # FIRST best anchor for allow_low_quality_matches (torchvision
    # includes every IoU tie) and applies the reference encoder's
    # 1.0-px size clamps — both inert for real (>1 px, untied) data.
    rpn_match_backend: str = "auto"
    rpn_fg_iou: float = 0.7
    rpn_bg_iou: float = 0.3
    rpn_batch: int = 256
    rpn_pos_fraction: float = 0.5

    # Box head sampling (torchvision RoIHeads defaults).
    box_fg_iou: float = 0.5
    box_batch: int = 512
    box_pos_fraction: float = 0.25
    box_reg_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)

    # Mask branch: supervised on the sampled foreground slots.
    mask_slots: int = 128

    # Inference postprocessing (torchvision RoIHeads defaults).
    score_thresh: float = 0.05
    det_nms_thresh: float = 0.5
    det_min_size: float = 1e-2
    max_detections: int = 100

    compute_dtype: str = "bfloat16"

    # torchvision's pretrained backbone uses FrozenBatchNorm2d
    # (running statistics in train mode, never updated). Default False
    # so from-scratch synthetic training keeps batch statistics; set
    # True when fine-tuning imported torchvision weights for exact
    # reference semantics (train_transfer.py:22).
    frozen_bn: bool = False

    @property
    def box_pos(self) -> int:
        return int(self.box_batch * self.box_pos_fraction)

    @property
    def rpn_pos(self) -> int:
        return int(self.rpn_batch * self.rpn_pos_fraction)


# ---------------------------------------------------------------------------
# Host-side static geometry.
# ---------------------------------------------------------------------------
def _ceil2(n: int) -> int:
    return (n + 1) // 2


@functools.lru_cache(maxsize=8)
def pyramid_shapes(h: int, w: int) -> Tuple[Tuple[int, int], ...]:
    """Feature shapes of P2..P6 for an (h, w) canvas. Every downsample in
    the R50-FPN stack (7x7/2 stem, 3x3/2 pool, stride-2 stages, P6
    maxpool) computes ceil(n/2)."""
    shapes = []
    ph, pw = _ceil2(h), _ceil2(w)          # stem
    ph, pw = _ceil2(ph), _ceil2(pw)        # maxpool -> stride 4
    shapes.append((ph, pw))
    for _ in range(3):                     # layers 2..4
        ph, pw = _ceil2(ph), _ceil2(pw)
        shapes.append((ph, pw))
    shapes.append((_ceil2(ph), _ceil2(pw)))  # P6
    return tuple(shapes)


@functools.lru_cache(maxsize=8)
def torchvision_anchors(shapes: Tuple[Tuple[int, int], ...],
                        sizes: Tuple[int, ...],
                        ratios: Tuple[float, ...],
                        strides: Tuple[int, ...]):
    """Per-level anchors in torchvision's convention: base anchors
    w = size/sqrt(ratio), h = size*sqrt(ratio), rounded, centered at
    (x*stride, y*stride); flattened (y, x, anchor) to match the NHWC head
    output layout. Returns (list of [A_l,4] float32, level sizes)."""
    out = []
    r = np.asarray(ratios, np.float64)
    h_r = np.sqrt(r)
    w_r = 1.0 / h_r
    for (h, w), size, stride in zip(shapes, sizes, strides):
        ws = size * w_r
        hs = size * h_r
        base = np.round(np.stack([-ws, -hs, ws, hs], axis=1) / 2.0)
        sy, sx = np.meshgrid(np.arange(h) * stride, np.arange(w) * stride,
                             indexing="ij")
        shift = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
        anch = (shift + base[None]).reshape(-1, 4).astype(np.float32)
        out.append(anch)
    return tuple(out)


def _encode_weighted(boxes: jnp.ndarray, anchors: jnp.ndarray,
                     weights: Tuple[float, ...]) -> jnp.ndarray:
    """torchvision BoxCoder.encode: weighted (dx,dy,dw,dh), no size
    clamps (proposals are min-size filtered upstream)."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = (anchors[:, 0] + anchors[:, 2]) * 0.5
    ay = (anchors[:, 1] + anchors[:, 3]) * 0.5
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    bx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    by = (boxes[:, 1] + boxes[:, 3]) * 0.5
    aw = jnp.maximum(aw, 1e-6)
    ah = jnp.maximum(ah, 1e-6)
    wx, wy, ww, wh = weights
    return jnp.stack([wx * (bx - ax) / aw, wy * (by - ay) / ah,
                      ww * jnp.log(bw / aw), wh * jnp.log(bh / ah)], axis=1)


def _decode_weighted(deltas: jnp.ndarray, boxes: jnp.ndarray,
                     weights: Tuple[float, ...]) -> jnp.ndarray:
    w = jnp.asarray(weights, jnp.float32)
    return decode_boxes(deltas / w, boxes)


# ---------------------------------------------------------------------------
# Head modules (param names chosen to mirror torchvision's state_dict —
# see models/torch_import.py).
# ---------------------------------------------------------------------------
class TwoMLPHead(nn.Module):
    """torchvision TwoMLPHead: flatten -> fc6 -> fc7 (1024 each)."""

    in_features: int = 256 * 7 * 7
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, rois: jnp.ndarray) -> jnp.ndarray:
        k = rois.shape[0]
        x = rois.reshape(k, self.in_features).astype(self.dtype)
        x = nn.relu(nn.Dense(1024, kernel_init=torch_default_kernel,
                             bias_init=torch_default_bias(self.in_features),
                             dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(1024, kernel_init=torch_default_kernel,
                             bias_init=torch_default_bias(1024),
                             dtype=self.dtype, name="fc7")(x))
        return x


class BoxPredictor(nn.Module):
    """torchvision FastRCNNPredictor (swapped to 2 classes like the
    reference, train_transfer.py:27-29)."""

    num_classes: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cls = nn.Dense(self.num_classes, kernel_init=normal_std(0.01),
                       bias_init=zeros, dtype=self.dtype,
                       name="cls_score")(x)
        box = nn.Dense(self.num_classes * 4, kernel_init=normal_std(0.001),
                       bias_init=zeros, dtype=self.dtype,
                       name="bbox_pred")(x)
        return cls.astype(jnp.float32), box.astype(jnp.float32)


class TransferMaskHead(nn.Module):
    """torchvision MaskRCNNHeads (4x conv3x3) + MaskRCNNPredictor
    (deconv 14->28 + 1x1 logits), fused into one module; the predictor
    is swapped to 2 classes (reference train_transfer.py:31-35)."""

    num_classes: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, rois: jnp.ndarray) -> jnp.ndarray:
        x = rois.astype(self.dtype)
        for i in range(1, 5):
            x = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                                kernel_init=kaiming_normal_fan_out,
                                bias_init=zeros, dtype=self.dtype,
                                name=f"mask_fcn{i}")(x))
        x = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                                     kernel_init=kaiming_normal_fan_out,
                                     bias_init=zeros, dtype=self.dtype,
                                     name="conv5_mask")(x))
        logits = nn.Conv(self.num_classes, (1, 1),
                         kernel_init=kaiming_normal_fan_out,
                         bias_init=zeros, dtype=self.dtype,
                         name="mask_fcn_logits")(x)
        return logits.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pure per-image pieces (vmapped; modules are applied flat outside).
# ---------------------------------------------------------------------------
def _level_proposals(cfg: TransferConfig, obj_l, dlt_l, anch_l, img_hw):
    """One level: top-k -> decode -> clip -> min-size -> NMS, static."""
    a_l = obj_l.shape[0]
    k_l = min(cfg.rpn_pre_topk_per_level, a_l)
    scores, idx = jax.lax.top_k(jax.nn.sigmoid(obj_l), k_l)
    bx = decode_boxes(dlt_l[idx], anch_l[idx])
    bx = clip_boxes(bx, img_hw)
    val = small_box_mask(bx, cfg.rpn_min_size)
    keep = min(k_l, cfg.rpn_post_nms)
    nms = nms_iterated if cfg.rpn_nms_mode == "sweep" else nms_fixed
    kidx, kval = nms(bx, scores, cfg.rpn_nms_thresh, keep, valid=val)
    return bx[kidx], jnp.where(kval, scores[kidx], -1.0), kval


def _image_proposals(cfg: TransferConfig, obj_levels, dlt_levels,
                     anchors, img_hw):
    """Per-level NMS then global top rpn_post_nms (torchvision
    RegionProposalNetwork.filter_proposals with level-wise batched_nms)."""
    boxes, scores = [], []
    for obj_l, dlt_l, anch_l in zip(obj_levels, dlt_levels, anchors):
        b, s, _ = _level_proposals(cfg, obj_l, dlt_l, anch_l, img_hw)
        boxes.append(b)
        scores.append(s)
    boxes = jnp.concatenate(boxes, axis=0)
    scores = jnp.concatenate(scores, axis=0)
    k = min(cfg.rpn_post_nms, scores.shape[0])
    top, idx = jax.lax.top_k(scores, k)
    return boxes[idx], top > 0.0


def _rpn_targets(cfg: TransferConfig, anchors, gt_boxes, gt_valid, rng):
    """torchvision RPN matching (fg>=0.7 or best-per-GT, bg<0.3) and
    256@50% sampling, static slots."""
    iou = box_iou(anchors, gt_boxes)                     # [A, I]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best = iou.max(axis=1)
    gidx = iou.argmax(axis=1)
    fg = best >= cfg.rpn_fg_iou
    # allow_low_quality_matches: anchors achieving each GT's max IoU.
    gt_max = iou.max(axis=0)                             # [I]
    lq = ((iou >= gt_max[None, :] - 1e-7) & gt_valid[None, :]
          & (gt_max[None, :] > 0)).any(axis=1)
    fg = fg | lq
    bg = (best < cfg.rpn_bg_iou) & ~fg

    kf, kb = jax.random.split(rng)
    fi, fv = sample_rows(kf, fg, cfg.rpn_pos)
    bi, bv = sample_rows(kb, bg, cfg.rpn_batch - cfg.rpn_pos)
    rows = jnp.concatenate([fi, bi])
    rval = jnp.concatenate([fv, bv])
    labels = jnp.concatenate([fv.astype(jnp.float32),
                              jnp.zeros_like(bv, jnp.float32)])
    matched = gt_boxes[gidx[fi]]
    reg_t = _encode_weighted(matched, anchors[fi], (1.0, 1.0, 1.0, 1.0))
    return rows, rval, labels, fi, fv, reg_t


def _rpn_targets_from_match(cfg: TransferConfig, anchors, max_iou,
                            tgt_planar, best_anchor, gt_boxes, gt_valid,
                            rng):
    """torchvision RPN matching/sampling from the fused Pallas matcher's
    per-image outputs (max_iou [A], tgt_planar [4, A] encoded (1,1,1,1),
    best_anchor [I]) — the [A, I] IoU matrix never exists in HBM.

    Matches _rpn_targets up to the backend nuances documented on
    TransferConfig.rpn_match_backend (asserted equivalent for untied
    >1 px data in tests/test_transfer.py)."""
    fg = max_iou >= cfg.rpn_fg_iou
    # allow_low_quality_matches: each valid GT's best anchor, provided
    # the GT overlaps anything at all. The pair IoU of (GT, its best
    # anchor) is O(I) — computed directly instead of via gt_max.
    ba = anchors[best_anchor]                                # [I, 4]
    iw = jnp.clip(jnp.minimum(ba[:, 2], gt_boxes[:, 2]) -
                  jnp.maximum(ba[:, 0], gt_boxes[:, 0]), 0.0)
    ih = jnp.clip(jnp.minimum(ba[:, 3], gt_boxes[:, 3]) -
                  jnp.maximum(ba[:, 1], gt_boxes[:, 1]), 0.0)
    pair_inter = iw * ih
    lq_ok = gt_valid & (pair_inter > 0.0)
    fg = fg | jnp.zeros_like(fg).at[best_anchor].max(lq_ok)
    bg = (max_iou < cfg.rpn_bg_iou) & ~fg

    kf, kb = jax.random.split(rng)
    fi, fv = sample_rows(kf, fg, cfg.rpn_pos)
    bi, bv = sample_rows(kb, bg, cfg.rpn_batch - cfg.rpn_pos)
    rows = jnp.concatenate([fi, bi])
    rval = jnp.concatenate([fv, bv])
    labels = jnp.concatenate([fv.astype(jnp.float32),
                              jnp.zeros_like(bv, jnp.float32)])
    reg_t = tgt_planar[:, fi].T                              # [pos, 4]
    return rows, rval, labels, fi, fv, reg_t


def _box_targets(cfg: TransferConfig, prop_boxes, prop_valid,
                 gt_boxes, gt_valid, rng):
    """torchvision RoIHeads: append GT to proposals, match at IoU 0.5,
    sample box_batch @ 25% positive (static fg/bg slot split)."""
    boxes = jnp.concatenate([prop_boxes, gt_boxes], axis=0)
    valid = jnp.concatenate([prop_valid, gt_valid], axis=0)
    iou = box_iou(boxes, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best = iou.max(axis=1)
    gidx = iou.argmax(axis=1)
    fg = (best >= cfg.box_fg_iou) & valid
    bg = (best < cfg.box_fg_iou) & valid

    kf, kb = jax.random.split(rng)
    fi, fv = sample_rows(kf, fg, cfg.box_pos)
    bi, bv = sample_rows(kb, bg, cfg.box_batch - cfg.box_pos)
    rows = jnp.concatenate([fi, bi])
    rval = jnp.concatenate([fv, bv])
    labels = jnp.concatenate([fv.astype(jnp.int32),
                              jnp.zeros_like(bv, jnp.int32)])
    sampled = boxes[rows]
    matched_gt = gidx[rows]
    reg_t = _encode_weighted(gt_boxes[matched_gt], sampled,
                             cfg.box_reg_weights)
    return sampled, rval, labels, matched_gt, reg_t, fv


# ---------------------------------------------------------------------------
class TransferMaskRCNN(nn.Module):
    """The assembled detector. apply(images[B,th,tw,3] in [0,1],
    targets?, train) -> torchvision loss dict | Detections (tile coords).
    """

    cfg: TransferConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.backbone = ResNetBackbone(depths=(3, 4, 6, 3),
                                       widths=(64, 128, 256, 512),
                                       bottleneck=True, dtype=dtype,
                                       frozen_bn=c.frozen_bn,
                                       stem_s2d=getattr(c, "stem_s2d",
                                                        False))
        self.fpn = FPN(in_channels=(256, 512, 1024, 2048),
                       out_channels=256, relu_outputs=False,
                       extra_maxpool=True, dtype=dtype)
        self.rpn = RPNHead(256, len(c.anchor_ratios), dtype=dtype)
        self.box_head = TwoMLPHead(256 * c.roi_size * c.roi_size,
                                   dtype=dtype)
        self.box_predictor = BoxPredictor(c.num_classes, dtype=dtype)
        self.mask_head = TransferMaskHead(c.num_classes, dtype=dtype)

    # -- shared trunk ----------------------------------------------------
    def _transform(self, images: jnp.ndarray) -> jnp.ndarray:
        """GeneralizedRCNNTransform: ImageNet-normalize, resize the tile
        to the 800-scale canvas, zero-pad width to a 32-multiple."""
        c = self.cfg
        mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
        std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std
        x = resize_bilinear(x, (c.image_height, c.resized_width))
        if c.resized_width < c.image_width:
            x = jnp.pad(x, ((0, 0), (0, 0),
                            (0, c.image_width - c.resized_width), (0, 0)))
        return x

    @property
    def _scale(self) -> Tuple[float, float]:
        c = self.cfg
        return (c.image_height / c.tile_height,
                c.resized_width / c.tile_width)

    def _features(self, x: jnp.ndarray, train: bool):
        # BatchNorm always runs on running stats: torchvision's detection
        # R50 uses FrozenBatchNorm2d throughout (misc_nn_ops), so the
        # transfer path must not update stats even in train mode.
        del train
        feats = self.backbone(x, False)
        return self.fpn(feats)   # P2..P6

    def _anchors(self):
        c = self.cfg
        shapes = pyramid_shapes(c.image_height, c.image_width)
        levels = torchvision_anchors(shapes, c.anchor_sizes,
                                     c.anchor_ratios, c.level_strides)
        return [jnp.asarray(a) for a in levels]

    def _rpn_outputs(self, feats):
        cls_out, box_out = self.rpn(feats)
        b = cls_out[0].shape[0]
        objs = [o.reshape(b, -1).astype(jnp.float32) for o in cls_out]
        dlts = [d.reshape(b, -1, 4).astype(jnp.float32) for d in box_out]
        return objs, dlts

    def _ms_roi(self, feats, boxes, out_size):
        """Batched MultiScaleRoIAlign via the configured backend.
        feats: 4 level maps [B, H_l, W_l, C]; boxes [B, K, 4]."""
        backend = self.cfg.roi_backend
        if backend == "auto":
            platform = jax.devices()[0].platform
            backend = "pallas" if platform in ("tpu", "axon") else "xla"
        if backend == "pallas":
            from livecell_tpu.ops.pallas_ms_roi import ms_roi_align_pallas

            return ms_roi_align_pallas(tuple(feats), boxes, out_size)
        return jax.vmap(lambda f, bx: multiscale_roi_align(
            tuple(f), bx, out_size))(tuple(feats), boxes)

    def _scaled_gt(self, targets):
        sy, sx = self._scale
        s = jnp.asarray([sx, sy, sx, sy], jnp.float32)
        return targets["boxes"].astype(jnp.float32) * s

    # -- training ----------------------------------------------------------
    def train_forward(self, images, targets) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        b = images.shape[0]
        x = self._transform(images)
        feats = self._features(x, train=True)
        objs, dlts = self._rpn_outputs(feats)
        anchors = self._anchors()
        anchors_cat = jnp.concatenate(anchors, axis=0)
        img_hw = (c.image_height, c.resized_width)

        gt_boxes = self._scaled_gt(targets)
        gt_valid = targets["valid"]
        gt_mask28 = targets["mask28"].astype(jnp.float32)

        rng = self.make_rng("sampling")
        k_rpn, k_box = jax.random.split(rng)
        rpn_keys = jax.random.split(k_rpn, b)
        box_keys = jax.random.split(k_box, b)

        obj_cat = jnp.concatenate(objs, axis=1)          # [B, A]
        dlt_cat = jnp.concatenate(dlts, axis=1)          # [B, A, 4]
        # RoIAlign pools the FPN maps in their bf16 compute dtype (the
        # heads cast to bf16 anyway; matches the custom path's feed) —
        # halves the kernel's VMEM traffic vs the old f32 up-cast.
        roi_feats = tuple(feats[:4])

        backend = c.rpn_match_backend
        if backend == "auto":
            platform = jax.devices()[0].platform
            backend = "pallas" if platform in ("tpu", "axon") else "xla"
        if backend == "pallas":
            from livecell_tpu.ops.pallas_match import match_anchors_pallas

            # One batched fused-matcher call outside the per-image vmap:
            # the [B, A~217k, I] IoU tensor stays in VMEM tiles.
            mx_b, tgt_b, best_b = match_anchors_pallas(
                anchors_cat, gt_boxes, gt_valid, full=True)
        else:
            mx_b = tgt_b = best_b = None

        def per_image(obj_i, dlt_i, gtb, gtv, gtm, kr, kb_,
                      match_i):
            # RPN loss pieces.
            if match_i is not None:
                rows, rval, rlabels, fi, fv, rpn_reg_t = \
                    _rpn_targets_from_match(
                        c, anchors_cat, match_i[0], match_i[1],
                        match_i[2], gtb, gtv, kr)
            else:
                rows, rval, rlabels, fi, fv, rpn_reg_t = _rpn_targets(
                    c, anchors_cat, gtb, gtv, kr)
            obj_s = obj_i[rows]
            rpn_reg_p = dlt_i[fi]

            # Proposals (stop-gradient like torchvision's detached
            # proposals) + box matching/sampling.
            obj_levels = jnp.split(
                obj_i, np.cumsum([a.shape[0] for a in anchors])[:-1])
            dlt_levels = jnp.split(
                dlt_i, np.cumsum([a.shape[0] for a in anchors])[:-1])
            pboxes, pvalid = _image_proposals(
                c, [jax.lax.stop_gradient(o) for o in obj_levels],
                [jax.lax.stop_gradient(d) for d in dlt_levels],
                anchors, img_hw)
            sampled, sval, labels, matched_gt, reg_t, fgv = _box_targets(
                c, pboxes, pvalid, gtb, gtv, kb_)

            # Mask targets for the fg slots; ROI pooling happens
            # batched OUTSIDE the vmap so the Pallas backend sees one
            # [B, K, 4] call.
            mb = sampled[:c.mask_slots]
            mgt_idx = matched_gt[:c.mask_slots]
            mtargets = reproject_mask28(gtm[mgt_idx], gtb[mgt_idx], mb)
            mvalid = fgv[:c.mask_slots]
            return (obj_s, rval, rlabels, rpn_reg_p, fv, rpn_reg_t,
                    sampled, sval, labels, reg_t, mb, mtargets, mvalid)

        if mx_b is not None:
            outs = jax.vmap(per_image)(
                obj_cat, dlt_cat, gt_boxes, gt_valid,
                gt_mask28, rpn_keys, box_keys, (mx_b, tgt_b, best_b))
        else:
            outs = jax.vmap(
                lambda *a: per_image(*a, None))(
                obj_cat, dlt_cat, gt_boxes, gt_valid,
                gt_mask28, rpn_keys, box_keys)
        (obj_s, rval, rlabels, rpn_reg_p, fv, rpn_reg_t,
         sampled_b, sval, labels, reg_t, mb_b, mtargets, mvalid) = outs
        box_rois = self._ms_roi(roi_feats, sampled_b, c.roi_size)
        mrois = self._ms_roi(roi_feats, mb_b, c.mask_roi_size)

        # ---- RPN losses (normalized like torchvision: by sampled count).
        n_sampled = jnp.maximum(rval.sum(), 1.0)
        loss_obj = (bce_with_logits(obj_s, rlabels) * rval).sum() / n_sampled
        reg = smooth_l1(rpn_reg_p.reshape(-1, 4),
                        rpn_reg_t.reshape(-1, 4), beta=1.0 / 9).sum(-1)
        loss_rpn_reg = (reg * fv.reshape(-1)).sum() / n_sampled

        # ---- Box head (flat GEMMs over B*box_batch ROIs on the MXU).
        flat_rois = box_rois.reshape((-1,) + box_rois.shape[2:])
        h = self.box_head(flat_rois)
        cls_logits, box_deltas = self.box_predictor(h)
        flat_labels = labels.reshape(-1)
        flat_sval = sval.reshape(-1)
        n_box = jnp.maximum(flat_sval.sum(), 1.0)
        logp = jax.nn.log_softmax(cls_logits, axis=-1)
        ce = -jnp.take_along_axis(logp, flat_labels[:, None], axis=1)[:, 0]
        loss_cls = (ce * flat_sval).sum() / n_box
        # class-1 delta slice, supervised on fg only.
        d1 = box_deltas.reshape(-1, c.num_classes, 4)[:, 1]
        reg = smooth_l1(d1, reg_t.reshape(-1, 4), beta=1.0 / 9).sum(-1)
        fg_flat = (flat_labels > 0) & flat_sval
        loss_reg = (reg * fg_flat).sum() / n_box

        # ---- Mask loss: BCE on class-1 logits over fg slots.
        flat_mrois = mrois.reshape((-1,) + mrois.shape[2:])
        mlogits = self.mask_head(flat_mrois)[..., 1]
        mt = mtargets.reshape(-1, c.mask_size, c.mask_size)
        mv = mvalid.reshape(-1).astype(jnp.float32)
        per_roi = bce_with_logits(
            mlogits.reshape(-1, c.mask_size, c.mask_size), mt
        ).mean(axis=(1, 2))
        loss_mask = (per_roi * mv).sum() / jnp.maximum(mv.sum(), 1.0)

        return {"loss_objectness": loss_obj,
                "loss_rpn_box_reg": loss_rpn_reg,
                "loss_classifier": loss_cls,
                "loss_box_reg": loss_reg,
                "loss_mask": loss_mask}

    # -- inference ---------------------------------------------------------
    def inference_forward(self, images) -> Detections:
        c = self.cfg
        b = images.shape[0]
        x = self._transform(images)
        feats = self._features(x, train=False)
        objs, dlts = self._rpn_outputs(feats)
        anchors = self._anchors()
        img_hw = (c.image_height, c.resized_width)
        roi_feats = tuple(feats[:4])   # bf16 feed, same as training

        obj_cat = jnp.concatenate(objs, axis=1)
        dlt_cat = jnp.concatenate(dlts, axis=1)
        splits = np.cumsum([a.shape[0] for a in anchors])[:-1]

        def proposals_fn(obj_i, dlt_i):
            return _image_proposals(
                c, jnp.split(obj_i, splits), jnp.split(dlt_i, splits),
                anchors, img_hw)

        pboxes, pvalid = jax.vmap(proposals_fn)(obj_cat, dlt_cat)
        rois = self._ms_roi(roi_feats, pboxes, c.roi_size)

        flat = rois.reshape((-1,) + rois.shape[2:])
        h = self.box_head(flat)
        cls_logits, box_deltas = self.box_predictor(h)
        p = pboxes.shape[1]
        scores = jax.nn.softmax(
            cls_logits.reshape(b, p, -1), axis=-1)[..., 1]
        d1 = box_deltas.reshape(b, p, c.num_classes, 4)[:, :, 1]

        def postprocess(boxes, sc, pv, deltas):
            refined = clip_boxes(
                _decode_weighted(deltas, boxes, c.box_reg_weights), img_hw)
            keep = (sc > c.score_thresh) & pv & \
                small_box_mask(refined, c.det_min_size)
            nms = nms_iterated if c.rpn_nms_mode == "sweep" else nms_fixed
            idx, kval = nms(refined, sc, c.det_nms_thresh,
                            c.max_detections, valid=keep)
            return refined[idx], sc[idx], kval

        det_boxes, det_scores, det_valid = jax.vmap(postprocess)(
            pboxes, scores, pvalid, d1)

        # Mask branch on the final boxes (torchvision RoIHeads eval path).
        mrois = self._ms_roi(roi_feats, det_boxes, c.mask_roi_size)
        mlogits = self.mask_head(mrois.reshape((-1,) + mrois.shape[2:]))
        mask_probs = jax.nn.sigmoid(
            mlogits[..., 1].reshape(b, c.max_detections,
                                    c.mask_size, c.mask_size))

        # Back to tile coordinates (GeneralizedRCNNTransform.postprocess).
        sy, sx = self._scale
        unscale = jnp.asarray([1 / sx, 1 / sy, 1 / sx, 1 / sy], jnp.float32)
        det_boxes = clip_boxes(det_boxes * unscale,
                               (c.tile_height, c.tile_width))
        return Detections(
            boxes=det_boxes, scores=det_scores,
            labels=jnp.ones((b, c.max_detections), jnp.int32),
            valid=det_valid, mask_probs=mask_probs)

    def init_forward(self, images, rois, mask_rois):
        """Cheap param-creation path touching every submodule once."""
        feats = self._features(images, train=False)
        cls_out, _ = self.rpn(feats)
        h = self.box_head(rois)
        cls_logits, deltas = self.box_predictor(h)
        mlogits = self.mask_head(mask_rois)
        return cls_out[0].sum() + cls_logits.sum() + mlogits.sum()

    def __call__(self, images, targets: Optional[Dict] = None,
                 train: bool = False):
        if train:
            assert targets is not None, "Targets required during training"
            return self.train_forward(images, targets)
        return self.inference_forward(images)


def create_transfer_model(model_cfg=None, rng: Optional[jax.Array] = None,
                          cfg: Optional[TransferConfig] = None,
                          pretrained_path: Optional[str] = None
                          ) -> Tuple[TransferMaskRCNN, Dict[str, Any]]:
    """Build the transfer model and init variables; optionally import a
    local torchvision maskrcnn_resnet50_fpn state_dict (the reference's
    pretrained=True, train_transfer.py:22).

    model_cfg (a ModelConfig) is accepted positionally for API symmetry
    with create_model; only its num_classes is consulted.
    """
    if cfg is None:
        kw = {}
        if model_cfg is not None and hasattr(model_cfg, "num_classes"):
            kw["num_classes"] = model_cfg.num_classes
        cfg = TransferConfig(**kw)
    if rng is None:
        rng = jax.random.key(0)
    model = TransferMaskRCNN(cfg)

    @jax.jit
    def _init(key):
        images = jnp.zeros((1, 64, 64, 3), jnp.float32)
        rois = jnp.zeros((1, cfg.roi_size, cfg.roi_size, 256), jnp.float32)
        mrois = jnp.zeros((1, cfg.mask_roi_size, cfg.mask_roi_size, 256),
                          jnp.float32)
        return model.init({"params": key}, images, rois, mrois,
                          method="init_forward")

    variables = _init(rng)
    if pretrained_path:
        from livecell_tpu.models.torch_import import load_torchvision_weights

        variables = jax.tree.map(
            jnp.asarray, load_torchvision_weights(variables,
                                                  pretrained_path))
    return model, variables
