"""Custom Mask R-CNN assembly (reference src/custom_maskrcnn.py:21-360),
rebuilt as one statically-shaped jittable graph.

Differences from the reference by design (TPU-first):
  * no per-image Python loops — inference runs batched with vmap over
    padded proposal/detection slots,
  * anchors are a compile-time constant (not regenerated per step,
    custom_maskrcnn.py:96-100),
  * mask pasting to full resolution is a separate op (ops.paste_masks) so
    the evaluation path never materializes [D, H, W] masks it won't read.

Semantics preserved (see models/detector.py docstring for the quirk list).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from livecell_tpu.config import ModelConfig
from livecell_tpu.models import detector
from livecell_tpu.models.cbam import CBAM
from livecell_tpu.models.fpn import FPN
from livecell_tpu.models.heads import BoxHead, MaskHead
from livecell_tpu.models.resnet import ResNetBackbone
from livecell_tpu.models.rpn import RPNHead
from livecell_tpu.ops.anchors import generate_anchors
from livecell_tpu.ops.boxes import clip_boxes, decode_boxes
from livecell_tpu.ops.nms import nms_fixed
from livecell_tpu.ops.proposals import (
    inference_proposals, training_proposals)
from livecell_tpu.ops.roi_align import roi_align


class CustomMaskRCNN(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.backbone = ResNetBackbone(dtype=dtype, frozen_bn=c.frozen_bn,
                                       stem_s2d=c.stem_s2d)
        self.cbam = [CBAM(ch, c.cbam_reduction, c.cbam_spatial_kernel,
                          dtype=dtype, name=f"cbam{i + 1}")
                     for i, ch in enumerate(c.backbone_channels)]
        self.fpn = FPN(c.backbone_channels, c.fpn_channels, dtype=dtype)
        self.rpn = RPNHead(c.fpn_channels, c.num_anchors_per_cell,
                           dtype=dtype)
        self.box_head = BoxHead(c.fpn_channels, c.num_classes,
                                c.roi_output_size, dtype=dtype)
        self.mask_head = MaskHead(c.fpn_channels, c.num_classes,
                                  c.mask_size, dtype=dtype)

    # ------------------------------------------------------------------
    # Shared trunk (reference extract_features, custom_maskrcnn.py:67-83).
    # ------------------------------------------------------------------
    def extract_features(self, images: jnp.ndarray, train: bool):
        # CBAM is chained serially — each stage consumes the previous
        # stage's *attended* output (custom_maskrcnn.py:77-80:
        # c2 = cbam2(layer2(c1)) where c1 = cbam1(layer1(x))).
        x = images.astype(jnp.dtype(self.cfg.compute_dtype))
        stages = self.backbone(x, train, post_stage=tuple(self.cbam))
        feats = self.fpn(stages)
        return feats

    def _anchors(self) -> jnp.ndarray:
        c = self.cfg
        return jnp.asarray(generate_anchors(
            (c.feature_height, c.feature_width), c.anchor_stride,
            c.anchor_sizes, c.anchor_ratios))

    def _match_anchors(self, anchors, gt_boxes, gt_valid, full=True):
        """Anchor-GT matching via the configured backend. The pallas
        kernel (ops/pallas_match.py) streams IoU tiles through VMEM;
        the xla path materializes the [B,N,I] matrix."""
        backend = self.cfg.match_backend
        if backend == "auto":
            platform = jax.devices()[0].platform
            backend = "pallas" if platform in ("tpu", "axon") else "xla"
        if backend == "pallas":
            from livecell_tpu.ops.pallas_match import match_anchors_pallas
            return match_anchors_pallas(anchors, gt_boxes, gt_valid,
                                        full=full)
        from livecell_tpu.ops.pallas_match import match_anchors_xla
        return match_anchors_xla(anchors, gt_boxes, gt_valid, full=full)

    def _roi_align(self, feats: jnp.ndarray, boxes: jnp.ndarray
                   ) -> jnp.ndarray:
        """Batched RoIAlign [B,H,W,C],[B,K,4] -> [B,K,s,s,C] via the
        configured backend (einsum contractions or the fused Pallas
        kernel, ops/pallas_roi_align.py)."""
        c = self.cfg
        backend = c.roi_backend
        if backend == "auto":
            # Pallas only on real TPU hardware ("tpu", or "axon" for the
            # tunneled chip); the CPU test mesh stays on einsum.
            platform = jax.devices()[0].platform
            backend = "pallas" if platform in ("tpu", "axon") else "einsum"
        if backend == "pallas" and c.roi_precision != "default":
            # The Pallas kernel interpolates in bf16; an explicit
            # roi_precision (fp32 CUDA-kernel parity) needs the einsum
            # path's `precision=` control.
            backend = "einsum"
        if backend == "pallas":
            from livecell_tpu.ops.pallas_roi_align import roi_align_pallas

            # The kernel interpolates in bf16 regardless; feeding bf16
            # halves its HBM input/output traffic and avoids an f32
            # cast of the whole feature map (~0.9 ms/step on the r3
            # trace). The heads consume the ROIs in bf16 anyway.
            return roi_align_pallas(
                feats.astype(jnp.bfloat16), boxes, c.roi_output_size,
                c.roi_spatial_scale, c.roi_sampling_ratio)
        return jax.vmap(lambda f, b: roi_align(
            f.astype(jnp.float32), b, c.roi_output_size,
            c.roi_spatial_scale, c.roi_sampling_ratio,
            precision=c.roi_precision))(feats, boxes)

    # ------------------------------------------------------------------
    # Training (reference forward_train, custom_maskrcnn.py:85-142).
    # ------------------------------------------------------------------
    def train_forward(self, images: jnp.ndarray,
                      targets: Dict[str, jnp.ndarray]
                      ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        feats = self.extract_features(images, train=True)
        cls_scores, bbox_deltas = self.rpn(feats)
        anchors = self._anchors()
        img_size = (c.image_height, c.image_width)

        rng = self.make_rng("sampling")
        k_rpn, k_prop = jax.random.split(rng)
        b = images.shape[0]
        # Two views of the RPN deltas, neither in f32 [B,N,4]: casting
        # + relaying the full delta tensor into a minor-dim-4 f32 array
        # cost ~2 ms/step (fwd convert + bwd relayout on the r3 trace).
        #   rpn_dlt  [B, N, 4] bf16 — row gathers in the proposal path
        #   rpn_nat  [B, N*4]  bf16 — free bitcast of the conv's NHWC
        #            layout, (y,x,a,c) order == [N,4] flattened; the reg
        #            loss consumes flat views (detector.py).
        rpn_dlt = bbox_deltas[0].reshape(b, -1, 4)
        rpn_nat = bbox_deltas[0].reshape(b, -1)

        if not c.heads_all_images:
            # Reference semantics: RPN loss on image-0 scores vs
            # batch-concatenated GT; heads train on image 0 only
            # (custom_maskrcnn.py:108-111, SURVEY.md §3.1).
            gt_flat = targets["boxes"].reshape(1, -1, 4)
            v_flat = targets["valid"].reshape(1, -1)
            max_iou0 = self._match_anchors(anchors, gt_flat, v_flat,
                                           full=False)[0]
            loss_rpn = detector.rpn_loss_single(
                cls_scores[0][0].reshape(-1).astype(jnp.float32), anchors,
                gt_flat[0], v_flat[0], k_rpn, c, max_iou=max_iou0)

            obj0 = cls_scores[0][0].reshape(-1).astype(jnp.float32)
            # Proposals are detached (torchvision RPN semantics): the
            # RPN trains only through its own losses, not through the
            # head losses' dependence on proposal geometry; decode (if
            # enabled) runs after the top-k inside training_proposals.
            from livecell_tpu.ops.topk import resolve_topk_approx
            props = training_proposals(
                obj0, anchors, img_size, k_prop, c.train_pre_topk,
                c.train_score_thresh, c.train_min_box_size,
                c.train_num_samples,
                deltas=rpn_dlt[0] if c.decode_proposals else None,
                approx_topk=resolve_topk_approx(c.topk_backend))

            feat0 = feats[0][0]  # dtype handled per-backend in _roi_align
            rois = self._roi_align(feat0[None], props.boxes[None])[0]
            cls_logits, box_deltas = self.box_head(rois)
            mask_logits = self.mask_head(rois)

            mask_gt = None
            if b > 1:
                # Reference quirk: mask targets are re-matched against GT
                # concatenated across the whole batch (mask_utils.py:88-108)
                # even though box targets use image 0 only.
                mask_gt = (
                    targets["boxes"].reshape(-1, 4),
                    targets["valid"].reshape(-1),
                    targets["mask28"].reshape(
                        (-1,) + targets["mask28"].shape[2:]))
            t = detector.match_head_targets(
                props.boxes, props.valid, targets["boxes"][0],
                targets["valid"][0], targets["mask28"][0], c,
                mask_gt=mask_gt)
            losses = detector.box_losses(cls_logits, box_deltas, t,
                                         c.num_classes)
            losses["loss_mask"] = detector.mask_loss(mask_logits, t)
            losses["loss_rpn_cls"] = loss_rpn
            if c.decode_proposals:
                mx0, tgt0, best0 = self._match_anchors(
                    anchors, targets["boxes"][:1], targets["valid"][:1])
                losses["loss_rpn_reg"] = detector.rpn_reg_loss_from_match(
                    rpn_nat[0], mx0[0], tgt0[0], best0[0],
                    targets["valid"][0], c)
            return losses

        # Fixed mode: every image supervises the RPN (per-image matching)
        # and feeds the heads; head GEMMs batch over B*K ROIs on the MXU.
        obj = cls_scores[0].reshape(b, -1).astype(jnp.float32)
        feat0 = feats[0]  # dtype handled per-backend in _roi_align
        keys = jax.random.split(k_prop, b)
        rpn_keys = jax.random.split(k_rpn, b)

        m = c.mask_train_samples
        use_subset = 0 < m < c.train_num_samples

        # Anchor-GT matching for the whole batch in one fused call (the
        # per-image IoU matrix + argmaxes + matched-box gather were
        # ~6.5 ms of a 29 ms step on the r3 trace).
        if c.decode_proposals:
            match = self._match_anchors(
                anchors, targets["boxes"], targets["valid"])
        else:
            match = (self._match_anchors(
                anchors, targets["boxes"], targets["valid"], full=False),
                None, None)
        max_iou_b, tgt_b, best_b = match

        def per_image(obj_i, dlt_i, nat_i, boxes_i, valid_i, mask28_i,
                      kp, kr, mx_i, extra):
            loss_rpn = detector.rpn_loss_single(
                obj_i, anchors, boxes_i, valid_i, kr, c, max_iou=mx_i)
            if c.decode_proposals:
                tgt_i, best_i = extra
                loss_rpn_reg = detector.rpn_reg_loss_from_match(
                    nat_i, mx_i, tgt_i, best_i, valid_i, c)
                # Deltas decoded inside training_proposals AFTER the
                # top-k (76x less decode/clip work), detached there.
                dec = dlt_i
            else:
                dec = None
                loss_rpn_reg = jnp.zeros(())
            from livecell_tpu.ops.topk import resolve_topk_approx
            props = training_proposals(
                obj_i, anchors, img_size, kp, c.train_pre_topk,
                c.train_score_thresh, c.train_min_box_size,
                c.train_num_samples, deltas=dec,
                approx_topk=resolve_topk_approx(c.topk_backend))
            t = detector.match_head_targets(
                props.boxes, props.valid, boxes_i, valid_i, mask28_i, c)
            if use_subset:
                # Mask-fg proposals first (top_k is stable on ties, so
                # proposal order is kept among equals); the mask head
                # then runs on the top m only. Identical loss while the
                # fg count <= m.
                order = jax.lax.top_k(t.mask_weight, m)[1]
                msel = (order, t.mask_targets[order],
                        t.mask_weight[order])
            else:
                msel = None
            return props.boxes, t, msel, loss_rpn, loss_rpn_reg

        extra_b = (tgt_b, best_b) if c.decode_proposals else None
        prop_boxes, t, msel, loss_rpn, loss_rpn_reg = jax.vmap(per_image)(
            obj, rpn_dlt, rpn_nat, targets["boxes"], targets["valid"],
            targets["mask28"], keys, rpn_keys, max_iou_b, extra_b)

        # RoIAlign batched over the whole batch (outside the vmap so the
        # Pallas backend sees one [B, K, 4] call).
        rois = self._roi_align(feat0, prop_boxes)
        flat_rois = rois.reshape((-1,) + rois.shape[2:])
        cls_logits, box_deltas = self.box_head(flat_rois)
        flat_t = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), t)
        losses = detector.box_losses(cls_logits, box_deltas, flat_t,
                                     c.num_classes)
        if use_subset:
            orders, mtargets, mweight = msel
            # Row selection as a one-hot MXU contraction: the dynamic
            # row gather of [B, m, 7, 7, C] ran at ~0.43 ms/step on the
            # r3 trace (vmap gather + layout copy) while the equivalent
            # [m, K] x [K, s*s*C] batched matmul is ~3 GFLOP at MXU
            # rate. Exact: one-hot rows select in any float dtype.
            onehot = jax.nn.one_hot(orders, rois.shape[1],
                                    dtype=rois.dtype)        # [B, m, K]
            # precision="highest": the default truncates dot inputs to
            # bf16 (even on CPU in this build), which would round the
            # f32 einsum-backend ROIs — selection must be exact.
            mrois = jax.lax.dot_general(
                onehot, rois.reshape(rois.shape[:2] + (-1,)),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(onehot.shape[:2] + rois.shape[2:])
            mask_logits = self.mask_head(
                mrois.reshape((-1,) + mrois.shape[2:]))
            losses["loss_mask"] = detector.mask_loss_on(
                mask_logits,
                mtargets.reshape((-1,) + mtargets.shape[2:]),
                mweight.reshape(-1))
        else:
            mask_logits = self.mask_head(flat_rois)
            losses["loss_mask"] = detector.mask_loss(mask_logits, flat_t)
        losses["loss_rpn_cls"] = loss_rpn.mean()
        if c.decode_proposals:
            losses["loss_rpn_reg"] = loss_rpn_reg.mean()
        return losses

    # ------------------------------------------------------------------
    # Inference (reference forward_inference, custom_maskrcnn.py:144-209),
    # batched instead of a per-image Python loop.
    # ------------------------------------------------------------------
    def inference_forward(self, images: jnp.ndarray) -> detector.Detections:
        c = self.cfg
        feats = self.extract_features(images, train=False)
        cls_scores, bbox_deltas = self.rpn(feats)
        anchors = self._anchors()
        img_size = (c.image_height, c.image_width)
        feat0 = feats[0]  # dtype handled per-backend in _roi_align
        b = images.shape[0]

        # NMS backend settled by measurement (scripts/bench_nms.py, r3):
        # the XLA fixed-iteration greedy beat a fused single-VMEM Pallas
        # kernel at every production shape (1.12 vs 2.08 ms @ 16x500,
        # 0.60 vs 0.78 @ 16x250, 2.80 vs 3.81 @ 8x1000), and the kernel
        # mismatched on hardware at n=1000; it was deleted.
        nms_fn = nms_fixed

        obj = cls_scores[0].reshape(b, -1).astype(jnp.float32)
        rpn_dlt = bbox_deltas[0].reshape(b, -1, 4)  # bf16; decode casts

        def per_image(obj_i, dlt_i):
            return inference_proposals(
                obj_i, anchors, img_size, c.infer_pre_topk,
                c.infer_score_thresh, c.infer_nms_thresh, c.infer_post_nms,
                c.infer_min_box_size, nms_fn=nms_fn,
                deltas=dlt_i if c.decode_proposals else None)

        props = jax.vmap(per_image)(obj, rpn_dlt)
        rois = self._roi_align(feat0, props.boxes)

        flat_rois = rois.reshape((-1,) + rois.shape[2:])
        cls_logits, head_deltas = self.box_head(flat_rois)
        d = c.infer_post_nms
        cls_logits = cls_logits.reshape(b, d, -1)
        head_deltas = head_deltas.reshape(b, d, -1)

        box_scores = jax.nn.softmax(cls_logits, axis=-1)[..., 1]

        def postprocess(boxes, scores, pvalid, deltas):
            if c.decode_proposals:
                # Refine with the box head's class-1 deltas (the slice the
                # reference trains but never applies,
                # custom_maskrcnn.py:234), undoing the box-coder weights
                # the targets were scaled by.
                w = jnp.asarray(c.box_reg_weights, jnp.float32)
                boxes = clip_boxes(decode_boxes(deltas[:, 4:8] / w, boxes),
                                   img_size)
            keep = (scores > c.det_score_thresh) & pvalid
            idx, kvalid = nms_fn(boxes, scores, c.det_nms_thresh,
                                 c.max_detections, valid=keep)
            return boxes[idx], scores[idx], kvalid, idx

        det_boxes, det_scores, det_valid, det_idx = jax.vmap(postprocess)(
            props.boxes, box_scores, props.valid, head_deltas)

        if c.decode_proposals:
            # With refined boxes the mask head runs on ROIs at the FINAL
            # detection boxes (torchvision-style second mask pass): the
            # mask targets are GT-box crops (mask_utils.py:107-112), so
            # predicting from the refined box — which approximates the GT
            # box — and pasting at that same box keeps the mask frame
            # consistent. Extracting at the raw proposal but pasting at
            # the refined box (the naive composition) misaligns masks by
            # exactly the refinement shift and caps mask AP75.
            mrois = self._roi_align(feat0, det_boxes)
            mask_logits = self.mask_head(
                mrois.reshape((-1,) + mrois.shape[2:]))
            mask_probs = jax.nn.sigmoid(
                mask_logits[..., 1].reshape(
                    b, c.max_detections, c.mask_size, c.mask_size))
        else:
            # Reference behavior: mask logits from the proposal ROIs,
            # gathered through NMS (custom_maskrcnn.py:170-207).
            mask_logits = self.mask_head(flat_rois)
            probs_all = jax.nn.sigmoid(
                mask_logits[..., 1].reshape(b, d, c.mask_size, c.mask_size))
            mask_probs = jax.vmap(lambda p, i: p[i])(probs_all, det_idx)

        return detector.Detections(
            boxes=det_boxes, scores=det_scores,
            labels=jnp.ones((b, c.max_detections), jnp.int32),
            valid=det_valid, mask_probs=mask_probs)

    def init_forward(self, images: jnp.ndarray, rois: jnp.ndarray):
        """Cheap path touching every submodule once, used only to create
        parameters (full image sizes are irrelevant to param shapes)."""
        feats = self.extract_features(images, train=False)
        cls_scores, bbox = self.rpn(feats)
        cls_logits, deltas = self.box_head(rois)
        mask_logits = self.mask_head(rois)
        return cls_scores[0].sum() + cls_logits.sum() + mask_logits.sum()

    def __call__(self, images: jnp.ndarray,
                 targets: Optional[Dict[str, jnp.ndarray]] = None,
                 train: bool = False):
        if train:
            assert targets is not None, "Targets required during training"
            return self.train_forward(images, targets)
        return self.inference_forward(images)


def count_parameters(params: Any) -> Dict[str, Any]:
    """Per-subsystem parameter counts (reference count_parameters,
    custom_maskrcnn.py:316-354)."""
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    groups = {"backbone": 0, "cbam": 0, "fpn": 0, "rpn": 0, "box_head": 0,
              "mask_head": 0, "roi_align": 0}
    total = 0
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 0
        total += n
        if "cbam" in name:
            groups["cbam"] += n
        elif "backbone" in name:
            groups["backbone"] += n
        elif "fpn" in name:
            groups["fpn"] += n
        elif "rpn" in name:
            groups["rpn"] += n
        elif "box_head" in name:
            groups["box_head"] += n
        elif "mask_head" in name:
            groups["mask_head"] += n
    custom = total - groups["backbone"]
    return {
        "total": total, **groups, "custom": custom,
        "custom_percentage": 100.0 * custom / total if total else 0.0,
        "memory_mb": total * 4 / (1024 ** 2),
    }


def create_model(cfg: ModelConfig, rng: jax.Array,
                 ) -> Tuple[CustomMaskRCNN, Dict[str, Any]]:
    """Build the model and initialize variables (params + batch_stats)."""
    model = CustomMaskRCNN(cfg)

    # Init must run under jit: on remote-tunneled backends (axon) eager
    # per-op dispatch is pathologically slow, and jit also lets XLA fold
    # the whole init into one program.
    @jax.jit
    def _init(key):
        images = jnp.zeros((1, 64, 64, 3), jnp.float32)
        rois = jnp.zeros(
            (1, cfg.roi_output_size, cfg.roi_output_size, cfg.fpn_channels),
            jnp.float32)
        return model.init({"params": key}, images, rois,
                          method="init_forward")

    return model, _init(rng)
