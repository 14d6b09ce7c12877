"""Mask target extraction, resizing, and pasting — batched, static shapes.

Replaces three reference code paths:
  * extract_mask_target + the per-proposal Python loop
    (reference mask_utils.py:6-46, 110-115),
  * the fixed bilinear 14->28 logit resize (reference mask_head.py:52-58),
  * per-detection mask paste loops (reference custom_maskrcnn.py:278-295,
    mask_utils.py:151-171).

All are two-einsum interpolation-matrix resamplings (see ops/interp.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from livecell_tpu.ops.interp import (
    crop_resize_matrices,
    paste_matrices,
    resize_weight_matrix,
)


def extract_mask_targets(masks: jnp.ndarray, boxes: jnp.ndarray,
                         mask_size: int = 28) -> jnp.ndarray:
    """Crop each mask to its box and resize to mask_size^2.

    Args:
      masks: [K, H, W] float or uint8 ground-truth masks (one per row,
        already gathered to match `boxes`).
      boxes: [K, 4] xyxy (the matched GT boxes — the reference crops at the
        GT box, mask_utils.py:107,112).

    Returns:
      [K, mask_size, mask_size] float32 targets.
    """
    k, h, w = masks.shape
    wy, wx = crop_resize_matrices(boxes.astype(jnp.float32), (h, w), mask_size)
    m = masks.astype(jnp.float32)
    t = jnp.einsum("kyh,khw->kyw", wy, m, preferred_element_type=jnp.float32, precision="highest")
    return jnp.einsum("kxw,kyw->kyx", wx, t,
                      preferred_element_type=jnp.float32, precision="highest")


def _reproject_axis(plo, phi, glo, ghi, m):
    """[K, m, m] weights resampling a GT-box-grid axis at proposal-box
    bin centers; samples outside the GT box get zero weight (no clamp)."""
    gspan = jnp.maximum(ghi - glo, 1e-6)
    j = jnp.arange(m, dtype=jnp.float32)
    y = plo[:, None] + (j[None, :] + 0.5) * \
        ((phi - plo)[:, None] / m) - 0.5                  # global coords
    u = (y - glo[:, None] + 0.5) * (m / gspan[:, None]) - 0.5
    idx = jnp.arange(m, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[..., None] - idx))


def reproject_mask28(mask28: jnp.ndarray, gt_boxes: jnp.ndarray,
                     prop_boxes: jnp.ndarray) -> jnp.ndarray:
    """Resample GT-box-cropped mask targets onto proposal-box grids.

    torchvision's maskrcnn_loss projects the dense GT mask onto each
    sampled *proposal* box (project_masks_on_boxes); this reproduces that
    from the precomputed GT-box-grid mask28 (the dense mask sampled on the
    GT box) without materializing full-resolution masks: proposal-box bin
    centers are mapped into the GT box's 28-grid index space and read
    bilinearly, zero outside the GT box.

    Args:
      mask28: [K, m, m] targets on the matched GT boxes' grids.
      gt_boxes: [K, 4] the matched GT boxes (same frame as prop_boxes).
      prop_boxes: [K, 4] sampled proposal boxes.

    Returns: [K, m, m] float32 targets aligned with the proposal grids.
    """
    m = mask28.shape[-1]
    wy = _reproject_axis(prop_boxes[:, 1], prop_boxes[:, 3],
                         gt_boxes[:, 1], gt_boxes[:, 3], m)
    wx = _reproject_axis(prop_boxes[:, 0], prop_boxes[:, 2],
                         gt_boxes[:, 0], gt_boxes[:, 2], m)
    t = jnp.einsum("kyu,kuv->kyv", wy, mask28.astype(jnp.float32),
                   preferred_element_type=jnp.float32, precision="highest")
    return jnp.einsum("kxv,kyv->kyx", wx, t,
                      preferred_element_type=jnp.float32, precision="highest")


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """F.interpolate(mode='bilinear', align_corners=False) for NHWC tensors
    with static sizes, via constant weight matrices."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    wy = jnp.asarray(resize_weight_matrix(h, oh))
    wx = jnp.asarray(resize_weight_matrix(w, ow))
    t = jnp.einsum("yh,...hwc->...ywc", wy, x.astype(jnp.float32),
                   precision="highest")
    out = jnp.einsum("xw,...ywc->...yxc", wx, t, precision="highest")
    return out.astype(x.dtype)


def paste_masks(
    mask_probs: jnp.ndarray,
    boxes: jnp.ndarray,
    image_size: tuple[int, int],
    threshold: float = 0.5,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Paste mask_size^2 probability maps into full-image binary masks.

    Matches the reference paste semantics (custom_maskrcnn.py:278-295):
    bilinear-resize each prob map to its (int-truncated, clamped) box,
    binarize at `threshold`, write inside the box, output uint8 * 255.

    Args:
      mask_probs: [K, m, m] probabilities (already sigmoid'ed class-1).
      boxes: [K,4] xyxy.
      image_size: (H, W).
      valid: optional [K] detection validity; invalid rows paste nothing.

    Returns:
      [K, H, W] uint8 masks in {0, 255}.
    """
    img_h, img_w = image_size
    py, px, nonempty = paste_matrices(
        boxes.astype(jnp.float32), (img_h, img_w), mask_probs.shape[-1])
    ok = nonempty if valid is None else (nonempty & valid)

    t = jnp.einsum("khm,kmn->khn", py, mask_probs.astype(jnp.float32),
                   preferred_element_type=jnp.float32, precision="highest")
    full = jnp.einsum("kwn,khn->khw", px, t,
                      preferred_element_type=jnp.float32, precision="highest")
    binary = (full > threshold) & ok[:, None, None]
    return binary.astype(jnp.uint8) * jnp.uint8(255)
