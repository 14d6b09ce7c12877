"""Plain-torch transcription of the reference custom Mask R-CNN training
path, for step-level parity testing against the JAX implementation.

Transcribed semantics (with citations into /root/reference/src):
  * ResNet-18 backbone split into stem + layer1..4 (custom_maskrcnn.py:29-37)
  * CBAM after each stage, chained serially (custom_maskrcnn.py:77-80)
  * FPN with ReLU'd 3x3 output convs (components/fpn.py:18-55)
  * RPN head + image-0 objectness loss with balanced sampling
    (components/rpn.py:19-121)
  * anchors: sizes x ratios with the w = h*ratio convention
    (components/anchor_generator.py:16-36)
  * training proposals = raw anchors through topk/score/clip/min-size
    (utils/proposal_utils.py:12-31) + randperm sampling
    (custom_maskrcnn.py:117)
  * RoIAlign(out 7, scale 1/4, sampling_ratio 2, aligned=False) — an
    interpolation-matrix formulation validated against the torchvision
    kernel transcription in tests/test_roi_align.py
  * box losses: CE over all sampled proposals, smooth-L1 on the class-1
    delta slice over IoU>=0.4 fg (custom_maskrcnn.py:210-240)
  * mask loss: fg at IoU>=0.4 vs image-0 GT, re-matched >0.3 against
    batch-concatenated GT, targets cropped at the matched GT box and
    bilinearly resized to 28x28 (custom_maskrcnn.py:242-263,
    utils/mask_utils.py:6-126)

The sampling sites (RPN pos/neg, proposal subset) use torch.randperm like
the reference; the parity test chooses shapes for which every sampling
step degenerates to "take all", so losses are RNG-independent.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ----------------------------------------------------------------------
# torch box utilities (reference utils/box_utils.py)
# ----------------------------------------------------------------------

def box_iou_t(a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = torch.maximum(a[:, None, :2], b[None, :, :2])
    rb = torch.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def encode_boxes_t(boxes: torch.Tensor, anchors: torch.Tensor
                   ) -> torch.Tensor:
    """reference box_utils.py:4-28 (min-size clamp 1.0)."""
    acx = (anchors[:, 0] + anchors[:, 2]) / 2.0
    acy = (anchors[:, 1] + anchors[:, 3]) / 2.0
    aw = (anchors[:, 2] - anchors[:, 0]).clamp(min=1.0)
    ah = (anchors[:, 3] - anchors[:, 1]).clamp(min=1.0)
    bcx = (boxes[:, 0] + boxes[:, 2]) / 2.0
    bcy = (boxes[:, 1] + boxes[:, 3]) / 2.0
    bw = (boxes[:, 2] - boxes[:, 0]).clamp(min=1.0)
    bh = (boxes[:, 3] - boxes[:, 1]).clamp(min=1.0)
    return torch.stack([(bcx - acx) / aw, (bcy - acy) / ah,
                        torch.log(bw / aw), torch.log(bh / ah)], dim=1)


def clip_boxes_t(boxes: torch.Tensor, image_size) -> torch.Tensor:
    h, w = image_size
    return torch.stack([boxes[:, 0].clamp(0, w), boxes[:, 1].clamp(0, h),
                        boxes[:, 2].clamp(0, w), boxes[:, 3].clamp(0, h)],
                       dim=1)


def generate_anchors_t(feature_hw, stride, sizes=(32, 64, 128),
                       ratios=(0.5, 1.0, 2.0)) -> torch.Tensor:
    """reference anchor_generator.py:13-36 (note w = h * ratio)."""
    h, w = feature_hw
    base = []
    for size in sizes:
        for ratio in ratios:
            ha = math.sqrt(size * size / ratio)
            wa = ha * ratio
            base.append([-wa / 2, -ha / 2, wa / 2, ha / 2])
    base = torch.tensor(base, dtype=torch.float32)
    sx = torch.arange(w, dtype=torch.float32) * stride
    sy = torch.arange(h, dtype=torch.float32) * stride
    gy, gx = torch.meshgrid(sy, sx, indexing="ij")
    shifts = torch.stack([gx, gy, gx, gy], dim=2).reshape(-1, 4)
    return (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4)


def roi_align_t(feat: torch.Tensor, boxes: torch.Tensor, out_size=7,
                scale=0.25, ratio=2) -> torch.Tensor:
    """Differentiable RoIAlign (torchvision aligned=False semantics; the
    formulation is the interp-matrix one golden-tested against the CUDA
    kernel transcription in tests/test_roi_align.py).

    feat: [C, H, W]; boxes: [K, 4] -> [K, C, out, out].
    """
    c, h, w = feat.shape
    n = out_size * ratio
    sx, sy = boxes[:, 0] * scale, boxes[:, 1] * scale
    rw = (boxes[:, 2] * scale - sx).clamp(min=1.0)
    rh = (boxes[:, 3] * scale - sy).clamp(min=1.0)
    s = torch.arange(n, dtype=feat.dtype)
    b = torch.div(s, ratio, rounding_mode="floor").to(feat.dtype)
    frac = (s % ratio + 0.5) / ratio
    ys = sy[:, None] + (b + frac)[None, :] * (rh / out_size)[:, None]
    xs = sx[:, None] + (b + frac)[None, :] * (rw / out_size)[:, None]

    def axis_w(coords, size):
        ok = (coords >= -1.0) & (coords <= size)
        cc = coords.clamp(0.0, size - 1.0)
        idx = torch.arange(size, dtype=feat.dtype)
        wgt = (1.0 - (cc[..., None] - idx).abs()).clamp(min=0.0)
        return wgt * ok[..., None].to(feat.dtype)

    wy = axis_w(ys, h)                                     # [K, n, H]
    wx = axis_w(xs, w)                                     # [K, n, W]
    samp = torch.einsum("kih,chw,kjw->kcij", wy, feat, wx)  # [K,C,n,n]
    k = boxes.shape[0]
    return samp.reshape(k, c, out_size, ratio, out_size, ratio
                        ).mean(dim=(3, 5))


def extract_mask_target_t(gt_mask: torch.Tensor, box: torch.Tensor,
                          mask_size=28) -> torch.Tensor:
    """reference mask_utils.py:6-46."""
    h, w = gt_mask.shape
    x1 = max(0, min(int(box[0]), w - 1))
    y1 = max(0, min(int(box[1]), h - 1))
    x2 = max(x1 + 1, min(int(box[2]), w))
    y2 = max(y1 + 1, min(int(box[3]), h))
    crop = gt_mask[y1:y2, x1:x2].float()[None, None]
    return F.interpolate(crop, size=(mask_size, mask_size),
                         mode="bilinear", align_corners=False)[0, 0]


# ----------------------------------------------------------------------
# Modules (named to mirror the JAX param tree for mechanical import)
# ----------------------------------------------------------------------

class ConvBN(nn.Module):
    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                              bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-5, momentum=0.1)

    def forward(self, x):
        return self.bn(self.conv(x))


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = ConvBN(cin, cout, 3, stride)
        self.conv2 = ConvBN(cout, cout, 3, 1)
        self.downsample = ConvBN(cin, cout, 1, stride) \
            if (stride != 1 or cin != cout) else None

    def forward(self, x):
        out = F.relu(self.conv1(x))
        out = self.conv2(out)
        idn = self.downsample(x) if self.downsample is not None else x
        return F.relu(out + idn)


class Backbone(nn.Module):
    """ResNet-18 stem + stages (torchvision structure,
    custom_maskrcnn.py:29-37)."""

    def __init__(self, depths=(2, 2, 2, 2), widths=(64, 128, 256, 512)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64, eps=1e-5, momentum=0.1)
        cin = 64
        self.stage_names = []
        for i, (depth, width) in enumerate(zip(depths, widths)):
            names = []
            for j in range(depth):
                stride = 2 if (i > 0 and j == 0) else 1
                name = f"layer{i + 1}_{j}"
                setattr(self, name, BasicBlock(cin, width, stride))
                cin = width
                names.append(name)
            self.stage_names.append(names)

    def forward(self, x, post_stage):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        feats = []
        for i, names in enumerate(self.stage_names):
            for name in names:
                x = getattr(self, name)(x)
            x = post_stage[i](x)
            feats.append(x)
        return feats


class ChannelAttention(nn.Module):
    def __init__(self, channels, reduction=16):
        super().__init__()
        self.fc1 = nn.Linear(channels, channels // reduction, bias=False)
        self.fc2 = nn.Linear(channels // reduction, channels, bias=False)

    def forward(self, x):
        avg = x.mean(dim=(2, 3))
        mx = x.amax(dim=(2, 3))
        y = self.fc2(F.relu(self.fc1(avg))) + self.fc2(F.relu(self.fc1(mx)))
        return x * torch.sigmoid(y)[:, :, None, None]


class SpatialAttention(nn.Module):
    def __init__(self, kernel_size=7):
        super().__init__()
        self.conv = nn.Conv2d(2, 1, kernel_size,
                              padding=kernel_size // 2, bias=False)

    def forward(self, x):
        y = torch.cat([x.mean(dim=1, keepdim=True),
                       x.amax(dim=1, keepdim=True)], dim=1)
        return x * torch.sigmoid(self.conv(y))


class CBAM(nn.Module):
    def __init__(self, channels, reduction=16, kernel_size=7):
        super().__init__()
        self.channel = ChannelAttention(channels, reduction)
        self.spatial = SpatialAttention(kernel_size)

    def forward(self, x):
        return self.spatial(self.channel(x))


class FPN(nn.Module):
    def __init__(self, in_channels=(64, 128, 256, 512), out_channels=256):
        super().__init__()
        for i, cin in enumerate(in_channels):
            setattr(self, f"lateral{i}", nn.Conv2d(cin, out_channels, 1))
            setattr(self, f"output{i}",
                    nn.Conv2d(out_channels, out_channels, 3, padding=1))
        self.n = len(in_channels)

    def forward(self, feats):
        lat = [getattr(self, f"lateral{i}")(f) for i, f in enumerate(feats)]
        for i in range(self.n - 1, 0, -1):
            lat[i - 1] = lat[i - 1] + F.interpolate(
                lat[i], size=lat[i - 1].shape[-2:], mode="nearest")
        return [F.relu(getattr(self, f"output{i}")(l))
                for i, l in enumerate(lat)]


class RPNHead(nn.Module):
    def __init__(self, in_channels=256, num_anchors=9):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, in_channels, 3, padding=1)
        self.cls_logits = nn.Conv2d(in_channels, num_anchors, 1)
        self.bbox_pred = nn.Conv2d(in_channels, num_anchors * 4, 1)

    def forward(self, feats):
        cls_out, box_out = [], []
        for f in feats:
            t = F.relu(self.conv(f))
            cls_out.append(self.cls_logits(t))
            box_out.append(self.bbox_pred(t))
        return cls_out, box_out


class BoxHead(nn.Module):
    def __init__(self, in_channels=256, num_classes=2):
        super().__init__()
        self.fc1 = nn.Linear(in_channels * 7 * 7, 1024)
        self.fc2 = nn.Linear(1024, 1024)
        self.cls_score = nn.Linear(1024, num_classes)
        self.bbox_pred = nn.Linear(1024, num_classes * 4)

    def forward(self, x):
        x = x.flatten(start_dim=1)
        x = F.relu(self.fc1(x))
        x = F.relu(self.fc2(x))
        return self.cls_score(x), self.bbox_pred(x)


class MaskHead(nn.Module):
    def __init__(self, in_channels=256, num_classes=2, mask_size=28):
        super().__init__()
        self.mask_size = mask_size
        self.conv1 = nn.Conv2d(in_channels, 256, 3, padding=1)
        self.conv2 = nn.Conv2d(256, 256, 3, padding=1)
        self.conv3 = nn.Conv2d(256, 256, 3, padding=1)
        self.conv4 = nn.Conv2d(256, 256, 3, padding=1)
        self.deconv = nn.ConvTranspose2d(256, 256, 2, stride=2)
        self.mask_fcn_logits = nn.Conv2d(256, num_classes, 1)

    def forward(self, x):
        for conv in (self.conv1, self.conv2, self.conv3, self.conv4):
            x = F.relu(conv(x))
        x = F.relu(self.deconv(x))
        logits = self.mask_fcn_logits(x)
        if logits.shape[-1] != self.mask_size:
            logits = F.interpolate(logits,
                                   size=(self.mask_size, self.mask_size),
                                   mode="bilinear", align_corners=False)
        return logits


class RefMaskRCNN(nn.Module):
    """Training-path assembly (reference forward_train,
    custom_maskrcnn.py:85-142)."""

    def __init__(self, num_classes=2, num_proposals=500, num_samples=128,
                 score_threshold=0.01, min_box_size=5.0,
                 rpn_pos_cap=128, rpn_batch=256):
        super().__init__()
        self.backbone = Backbone()
        self.cbam1 = CBAM(64)
        self.cbam2 = CBAM(128)
        self.cbam3 = CBAM(256)
        self.cbam4 = CBAM(512)
        self.fpn = FPN()
        self.rpn = RPNHead()
        self.box_head = BoxHead(num_classes=num_classes)
        self.mask_head = MaskHead(num_classes=num_classes)
        self.num_proposals = num_proposals
        self.num_samples = num_samples
        self.score_threshold = score_threshold
        self.min_box_size = min_box_size
        self.rpn_pos_cap = rpn_pos_cap
        self.rpn_batch = rpn_batch

    def extract_features(self, images):
        cbams = [self.cbam1, self.cbam2, self.cbam3, self.cbam4]
        return self.fpn(self.backbone(images, cbams))

    def rpn_objectness_loss(self, cls_scores, anchors, targets):
        """reference rpn.py:42-121 (image-0 scores vs concat-batch GT)."""
        flat = cls_scores[0].permute(0, 2, 3, 1).reshape(-1)
        gt = [t["boxes"] for t in targets if len(t["boxes"]) > 0]
        if not gt:
            return flat.sum() * 0.0 + 0.1
        gt = torch.cat(gt)
        ious = box_iou_t(anchors, gt)
        max_ious = ious.max(dim=1).values
        pos_mask = max_ious >= 0.5
        neg_mask = max_ious < 0.3
        num_pos = min(int(pos_mask.sum()), self.rpn_pos_cap)
        num_neg = min(int(neg_mask.sum()), self.rpn_batch - num_pos)
        pos_idx = torch.where(pos_mask)[0]
        pos_idx = pos_idx[torch.randperm(len(pos_idx))[:num_pos]]
        neg_idx = torch.where(neg_mask)[0]
        neg_idx = neg_idx[torch.randperm(len(neg_idx))[:num_neg]]
        labels = torch.zeros(len(anchors))
        labels[pos_idx] = 1.0
        sampled = torch.cat([pos_idx, neg_idx])
        if len(sampled) == 0:
            return flat.mean() * 0.1
        return F.binary_cross_entropy_with_logits(flat[sampled],
                                                  labels[sampled])

    def training_proposals(self, cls_score, anchors, image_size):
        """reference proposal_utils.py:12-31."""
        obj = torch.sigmoid(cls_score).permute(1, 2, 0).reshape(-1)
        k = min(self.num_proposals, len(obj))
        top_scores, top_idx = torch.topk(obj, k)
        keep = top_scores > self.score_threshold
        props = anchors[top_idx[keep]]
        props = clip_boxes_t(props, image_size)
        ws = props[:, 2] - props[:, 0]
        hs = props[:, 3] - props[:, 1]
        ok = (ws >= self.min_box_size) & (hs >= self.min_box_size)
        return props[ok]

    def forward_train(self, images, targets):
        feats = self.extract_features(images)
        cls_scores, bbox_deltas = self.rpn(feats)
        fh, fw = feats[0].shape[-2:]
        anchors = generate_anchors_t((fh, fw), stride=4)

        loss_rpn = self.rpn_objectness_loss(cls_scores, anchors, targets)

        proposals = self.training_proposals(
            cls_scores[0][0], anchors, images.shape[-2:])
        if len(proposals) > self.num_samples:
            perm = torch.randperm(len(proposals))[:self.num_samples]
            proposals = proposals[perm]

        roi = roi_align_t(feats[0][0], proposals)
        cls_logits, box_regression = self.box_head(roi)
        mask_logits = self.mask_head(roi)

        # Box losses vs image-0 GT (custom_maskrcnn.py:210-240).
        gt0 = targets[0]["boxes"]
        ious = box_iou_t(proposals, gt0)
        max_iou, matched = ious.max(dim=1)
        labels = (max_iou >= 0.4).long()
        loss_cls = F.cross_entropy(cls_logits, labels)
        fg = labels == 1
        if int(fg.sum()) > 0:
            t_deltas = encode_boxes_t(gt0[matched[fg]], proposals[fg])
            loss_reg = F.smooth_l1_loss(box_regression[fg][:, 4:8],
                                        t_deltas, reduction="mean")
        else:
            loss_reg = torch.zeros(())

        # Mask loss: fg vs image-0, re-matched vs concat-batch GT
        # (custom_maskrcnn.py:242-263 + mask_utils.py:49-126).
        fg_logits = mask_logits[fg]
        fg_props = proposals[fg]
        gt_boxes_all = torch.cat([t["boxes"] for t in targets])
        gt_masks_all = torch.cat([t["masks"] for t in targets])
        if int(fg.sum()) > 0 and len(gt_boxes_all) > 0:
            mious = box_iou_t(fg_props, gt_boxes_all)
            m_max, m_arg = mious.max(dim=1)
            keep = m_max > 0.3
            if int(keep.sum()) > 0:
                tgt = torch.stack([
                    extract_mask_target_t(gt_masks_all[g], gt_boxes_all[g])
                    for g in m_arg[keep]])
                loss_mask = F.binary_cross_entropy_with_logits(
                    fg_logits[keep][:, 1], tgt, reduction="mean")
            else:
                loss_mask = torch.zeros(())
        else:
            loss_mask = torch.zeros(())

        return {"loss_rpn_cls": loss_rpn, "loss_box_cls": loss_cls,
                "loss_box_reg": loss_reg, "loss_mask": loss_mask}

    forward = forward_train
