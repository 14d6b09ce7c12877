"""Interpolation-matrix resampling vs torch F.interpolate goldens.

torch (CPU) ships in the environment, so the exact reference semantics
(bilinear, align_corners=False) are checked directly against it.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from livecell_tpu.ops.interp import resize_weight_matrix
from livecell_tpu.ops.mask_ops import (
    extract_mask_targets, paste_masks, resize_bilinear)


def torch_resize(x_np, out_hw):
    t = torch.from_numpy(x_np)[None, None]
    return F.interpolate(t, size=out_hw, mode="bilinear",
                         align_corners=False)[0, 0].numpy()


def test_resize_matrix_matches_torch_upsample(rng):
    x = rng.standard_normal((14, 14)).astype(np.float32)
    wy = resize_weight_matrix(14, 28)
    got = wy @ x @ wy.T
    want = torch_resize(x, (28, 28))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_matrix_matches_torch_downsample(rng):
    x = rng.standard_normal((37, 23)).astype(np.float32)
    got = resize_weight_matrix(37, 9) @ x @ resize_weight_matrix(23, 15).T
    want = torch_resize(x, (9, 15))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_nhwc(rng):
    x = rng.standard_normal((2, 14, 14, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (28, 28)))
    for b in range(2):
        for c in range(3):
            want = torch_resize(x[b, :, :, c], (28, 28))
            np.testing.assert_allclose(got[b, :, :, c], want,
                                       rtol=1e-4, atol=1e-4)


def reference_extract_mask_target(gt_mask, box, mask_size=28):
    """Direct transcription of the reference algorithm
    (mask_utils.py:6-46) using torch, as a golden."""
    x1, y1, x2, y2 = [int(v) for v in box]
    h, w = gt_mask.shape
    x1 = max(0, min(x1, w - 1)); y1 = max(0, min(y1, h - 1))
    x2 = max(x1 + 1, min(x2, w)); y2 = max(y1 + 1, min(y2, h))
    crop = gt_mask[y1:y2, x1:x2].astype(np.float32)
    return torch_resize(crop, (mask_size, mask_size))


def test_extract_mask_targets_matches_reference(rng):
    h, w = 60, 80
    masks = (rng.uniform(size=(5, h, w)) > 0.6).astype(np.float32)
    boxes = np.array([
        [10.3, 5.9, 40.2, 50.1],
        [-4.0, -2.0, 20.0, 30.0],     # negative corner -> clamped
        [70.0, 50.0, 95.0, 75.0],     # exceeds image -> clamped
        [15.0, 15.0, 15.4, 15.2],     # degenerate -> 1px floor
        [0.0, 0.0, 80.0, 60.0],       # full image
    ], dtype=np.float32)

    got = np.asarray(extract_mask_targets(
        jnp.asarray(masks), jnp.asarray(boxes), 28))
    for k in range(5):
        want = reference_extract_mask_target(masks[k], boxes[k])
        np.testing.assert_allclose(got[k], want, rtol=1e-4, atol=1e-4,
                                   err_msg=f"box {k}")


def reference_paste(mask_prob, box, img_hw, threshold=0.5):
    """Transcription of the reference paste loop
    (custom_maskrcnn.py:278-293)."""
    img_h, img_w = img_hw
    out = np.zeros(img_hw, dtype=np.float32)
    x1, y1, x2, y2 = [int(v) for v in box]
    x1, y1 = max(0, x1), max(0, y1)
    x2, y2 = min(img_w, x2), min(img_h, y2)
    if x2 > x1 and y2 > y1:
        resized = torch_resize(mask_prob, (y2 - y1, x2 - x1))
        out[y1:y2, x1:x2] = (resized > threshold).astype(np.float32)
    return (out * 255).astype(np.uint8)


def test_paste_masks_matches_reference(rng):
    img_hw = (50, 70)
    probs = rng.uniform(size=(4, 28, 28)).astype(np.float32)
    boxes = np.array([
        [5.2, 8.9, 33.0, 44.0],
        [-10.0, -5.0, 20.0, 25.0],
        [60.0, 40.0, 90.0, 80.0],
        [30.0, 30.0, 30.0, 30.0],     # empty after truncation
    ], dtype=np.float32)

    got = np.asarray(paste_masks(jnp.asarray(probs), jnp.asarray(boxes),
                                 img_hw))
    for k in range(4):
        want = reference_paste(probs[k], boxes[k], img_hw)
        # Pixels whose prob is within 1e-4 of 0.5 may binarize differently
        # due to fp reassociation; none should exist for random uniforms.
        np.testing.assert_array_equal(got[k], want, err_msg=f"box {k}")


def test_paste_masks_respects_validity(rng):
    probs = np.ones((2, 28, 28), dtype=np.float32)
    boxes = np.array([[2.0, 2.0, 8.0, 8.0]] * 2, dtype=np.float32)
    got = np.asarray(paste_masks(
        jnp.asarray(probs), jnp.asarray(boxes), (20, 20),
        valid=jnp.asarray([True, False])))
    assert got[0].max() == 255
    assert got[1].max() == 0


def test_reproject_mask28_identity():
    """Projecting onto the GT box itself is exactly the identity."""
    from livecell_tpu.ops.mask_ops import reproject_mask28

    rng = np.random.default_rng(3)
    m = rng.uniform(size=(4, 28, 28)).astype(np.float32)
    boxes = np.array([[10, 20, 50, 60]] * 4, np.float32)
    out = reproject_mask28(jnp.asarray(m), jnp.asarray(boxes),
                           jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(out), m, atol=1e-5)


def test_reproject_mask28_matches_dense_projection():
    """Reprojection from the GT-box-grid mask28 agrees with projecting the
    dense GT mask directly onto the proposal box (a larger-grid resample),
    and reads zero outside the GT box."""
    from livecell_tpu.ops.mask_ops import reproject_mask28

    h = w = 112
    yy, xx = np.mgrid[0:h, 0:w]
    # Smooth blob centered in the GT box.
    dense = np.exp(-(((yy - 48) / 14.0) ** 2 + ((xx - 56) / 18.0) ** 2))
    dense = (dense > 0.4).astype(np.float32)
    gt_box = np.array([[32.0, 24.0, 80.0, 72.0]], np.float32)
    prop = np.array([[40.0, 30.0, 92.0, 80.0]], np.float32)

    def sample_grid(box, n=28):
        x1, y1, x2, y2 = box
        j = np.arange(n)
        ys = y1 + (j + 0.5) * (y2 - y1) / n - 0.5
        xs = x1 + (j + 0.5) * (x2 - x1) / n - 0.5
        out = np.zeros((n, n), np.float32)
        for a, y in enumerate(ys):
            for b, x in enumerate(xs):
                y0, x0 = int(np.floor(y)), int(np.floor(x))
                fy, fx = y - y0, x - x0
                acc = 0.0
                for dy in (0, 1):
                    for dx in (0, 1):
                        yy_, xx_ = y0 + dy, x0 + dx
                        if 0 <= yy_ < h and 0 <= xx_ < w:
                            wgt = (fy if dy else 1 - fy) * \
                                  (fx if dx else 1 - fx)
                            acc += wgt * dense[yy_, xx_]
                out[a, b] = acc
        return out

    mask28 = sample_grid(gt_box[0])              # GT-box grid of the dense
    want = sample_grid(prop[0])                  # proposal-box grid, dense
    got = np.asarray(reproject_mask28(
        jnp.asarray(mask28[None]), jnp.asarray(gt_box), jnp.asarray(prop)))[0]
    # Reprojection resamples a 28-grid, not the dense mask: agreement is
    # approximate at mask edges but must be tight in aggregate.
    assert np.abs(got - want).mean() < 0.02
    assert np.abs(got - want).max() < 0.5
    # Region of the proposal box right of the GT box reads ~0.
    assert got[:, -3:].max() < 0.05


def _centroid(m):
    ys, xs = np.nonzero(m)
    return np.array([ys.mean(), xs.mean()])


def test_mask_roundtrip_alignment():
    """Full-chain geometry: dense GT mask -> extract mask28 at box ->
    paste back at the same box. Off-by-half errors would shift the
    centroid or depress the IoU systematically."""
    from livecell_tpu.ops.mask_ops import extract_mask_targets, paste_masks

    rng = np.random.default_rng(7)
    h, w = 96, 128
    ious, offsets = [], []
    for trial in range(20):
        # Elliptical blob with random center/size; box = tight bbox.
        cy = rng.uniform(25, h - 25)
        cx = rng.uniform(25, w - 25)
        ry = rng.uniform(8, 20)
        rx = rng.uniform(8, 20)
        yy, xx = np.mgrid[0:h, 0:w]
        mask = ((((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) <= 1.0
                ).astype(np.float32)
        ys, xs = np.nonzero(mask)
        box = np.array([[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]],
                       np.float32)

        m28 = extract_mask_targets(jnp.asarray(mask[None]),
                                   jnp.asarray(box))
        pasted = np.asarray(paste_masks(m28, jnp.asarray(box),
                                        (h, w)))[0] > 0

        inter = np.logical_and(pasted, mask > 0.5).sum()
        union = np.logical_or(pasted, mask > 0.5).sum()
        ious.append(inter / union)
        offsets.append(np.abs(_centroid(pasted) - _centroid(mask > 0.5)))
    ious = np.asarray(ious)
    offsets = np.asarray(offsets)
    # 28x28 resampling of a ~30px blob keeps IoU high; misalignment bugs
    # (half-pixel shifts compound across extract+paste) would sink these.
    assert ious.min() > 0.88, ious.min()
    assert ious.mean() > 0.93, ious.mean()
    assert offsets.max() < 0.75, offsets.max()
    assert np.linalg.norm(offsets.mean(axis=0)) < 0.25, offsets.mean(axis=0)


def test_mask_roundtrip_at_shifted_detection_box():
    """Detection boxes rarely equal the GT box. Pasting the GT-box
    mask28 at a slightly shifted box (as inference does with predicted
    masks) degrades IoU smoothly — quantifies how much of AP75 loss is
    box error, not mask-geometry error."""
    from livecell_tpu.ops.mask_ops import extract_mask_targets, paste_masks

    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((((yy - 48) / 16.0) ** 2 + ((xx - 64) / 18.0) ** 2) <= 1.0
            ).astype(np.float32)
    ys, xs = np.nonzero(mask)
    box = np.array([[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]],
                   np.float32)
    m28 = extract_mask_targets(jnp.asarray(mask[None]), jnp.asarray(box))

    def iou_at(dx):
        shifted = box + np.array([dx, 0, dx, 0], np.float32)
        pasted = np.asarray(paste_masks(m28, jnp.asarray(shifted),
                                        (h, w)))[0] > 0
        inter = np.logical_and(pasted, mask > 0.5).sum()
        return inter / np.logical_or(pasted, mask > 0.5).sum()

    exact = iou_at(0.0)
    assert exact > 0.9
    # 2px box error ~ IoU .75-.9; 6px ~ IoU < .8 — AP75 requires boxes
    # within ~2px on 30px cells, so box regression quality dominates.
    assert iou_at(2.0) < exact
    assert iou_at(6.0) < iou_at(2.0) < 0.95
    assert iou_at(6.0) > 0.4
