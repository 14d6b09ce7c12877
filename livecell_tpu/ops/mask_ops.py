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
