"""Generate a shape-complete fake torchvision maskrcnn_resnet50_fpn
state_dict (all parameter/buffer keys with correct shapes) for importer
tests — no network / torchvision needed.

Naming follows torchvision 0.22 (reference requirements.txt:3):
backbone.body.* (ResNet-50), backbone.fpn.{inner,layer}_blocks.{i}.0.*,
rpn.head.{conv.0.0, cls_logits, bbox_pred}, roi_heads.{box_head,
box_predictor, mask_head.mask_fcnK, mask_predictor}. Class-dependent
predictor tensors get COCO's 91 classes like the real pretrained
checkpoint (reference train_transfer.py:22 loads pretrained=True and
then swaps those predictors).
"""

import numpy as np

R50_DEPTHS = (3, 4, 6, 3)
R50_WIDTHS = (64, 128, 256, 512)
FPN_IN = (256, 512, 1024, 2048)


def fake_torchvision_maskrcnn_state_dict(num_classes=91, seed=0):
    rng = np.random.default_rng(seed)
    sd = {}

    def t(name, *shape):
        sd[name] = rng.normal(0, 0.02, size=shape).astype(np.float32)

    def bn(prefix, ch):
        t(f"{prefix}.weight", ch)
        t(f"{prefix}.bias", ch)
        t(f"{prefix}.running_mean", ch)
        sd[f"{prefix}.running_var"] = np.abs(
            rng.normal(1, 0.1, size=ch)).astype(np.float32)
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(1, np.int64)

    body = "backbone.body"
    t(f"{body}.conv1.weight", 64, 3, 7, 7)
    bn(f"{body}.bn1", 64)
    in_ch = 64
    for stage, (depth, w) in enumerate(zip(R50_DEPTHS, R50_WIDTHS), 1):
        for j in range(depth):
            p = f"{body}.layer{stage}.{j}"
            t(f"{p}.conv1.weight", w, in_ch, 1, 1)
            bn(f"{p}.bn1", w)
            t(f"{p}.conv2.weight", w, w, 3, 3)
            bn(f"{p}.bn2", w)
            t(f"{p}.conv3.weight", w * 4, w, 1, 1)
            bn(f"{p}.bn3", w * 4)
            if j == 0:
                t(f"{p}.downsample.0.weight", w * 4, in_ch, 1, 1)
                bn(f"{p}.downsample.1", w * 4)
            in_ch = w * 4

    for i, c in enumerate(FPN_IN):
        t(f"backbone.fpn.inner_blocks.{i}.0.weight", 256, c, 1, 1)
        t(f"backbone.fpn.inner_blocks.{i}.0.bias", 256)
        t(f"backbone.fpn.layer_blocks.{i}.0.weight", 256, 256, 3, 3)
        t(f"backbone.fpn.layer_blocks.{i}.0.bias", 256)

    t("rpn.head.conv.0.0.weight", 256, 256, 3, 3)
    t("rpn.head.conv.0.0.bias", 256)
    t("rpn.head.cls_logits.weight", 3, 256, 1, 1)
    t("rpn.head.cls_logits.bias", 3)
    t("rpn.head.bbox_pred.weight", 12, 256, 1, 1)
    t("rpn.head.bbox_pred.bias", 12)

    t("roi_heads.box_head.fc6.weight", 1024, 256 * 7 * 7)
    t("roi_heads.box_head.fc6.bias", 1024)
    t("roi_heads.box_head.fc7.weight", 1024, 1024)
    t("roi_heads.box_head.fc7.bias", 1024)
    t("roi_heads.box_predictor.cls_score.weight", num_classes, 1024)
    t("roi_heads.box_predictor.cls_score.bias", num_classes)
    t("roi_heads.box_predictor.bbox_pred.weight", num_classes * 4, 1024)
    t("roi_heads.box_predictor.bbox_pred.bias", num_classes * 4)

    for k in range(1, 5):
        t(f"roi_heads.mask_head.mask_fcn{k}.weight", 256, 256, 3, 3)
        t(f"roi_heads.mask_head.mask_fcn{k}.bias", 256)
    t("roi_heads.mask_predictor.conv5_mask.weight", 256, 256, 2, 2)
    t("roi_heads.mask_predictor.conv5_mask.bias", 256)
    t("roi_heads.mask_predictor.mask_fcn_logits.weight",
      num_classes, 256, 1, 1)
    t("roi_heads.mask_predictor.mask_fcn_logits.bias", num_classes)

    return sd
