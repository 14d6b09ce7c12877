"""Box geometry ops.

TPU-native equivalents of the reference box utilities
(reference src/utils/box_utils.py:1-44 and torchvision.ops.box_iou):
pure jnp, fully vectorized, shape-static, safe to run on padded /
invalid rows (callers mask results).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [N,4] xyxy boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between [N,4] and [M,4] xyxy boxes -> [N,M].

    Matches torchvision.ops.box_iou (used throughout the reference, e.g.
    rpn.py:72, custom_maskrcnn.py:221). Degenerate/zero boxes yield IoU 0.
    """
    area_a = box_area(boxes_a)  # [N]
    area_b = box_area(boxes_b)  # [M]

    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])  # [N,M,2]
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])  # [N,M,2]
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]

    union = area_a[:, None] + area_b[None, :] - inter
    # Divide by a floored denominator so union==0 never materializes a
    # NaN (jnp.where would discard it, but intermediate NaNs poison
    # reverse-mode gradients and jax_debug_nans runs).
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def encode_boxes(boxes: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Encode target boxes relative to anchors as (dx, dy, dw, dh).

    Same formulas and the min-size 1.0 clamps as the reference encoder
    (reference box_utils.py:4-28).
    """
    aw = jnp.clip(anchors[:, 2] - anchors[:, 0], 1.0)
    ah = jnp.clip(anchors[:, 3] - anchors[:, 1], 1.0)
    ax = (anchors[:, 0] + anchors[:, 2]) * 0.5
    ay = (anchors[:, 1] + anchors[:, 3]) * 0.5

    bw = jnp.clip(boxes[:, 2] - boxes[:, 0], 1.0)
    bh = jnp.clip(boxes[:, 3] - boxes[:, 1], 1.0)
    bx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    by = (boxes[:, 1] + boxes[:, 3]) * 0.5

    dx = (bx - ax) / aw
    dy = (by - ay) / ah
    dw = jnp.log(bw / aw)
    dh = jnp.log(bh / ah)
    return jnp.stack([dx, dy, dw, dh], axis=1)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray,
                 clip_log: float = 4.135) -> jnp.ndarray:
    """Invert `encode_boxes`: apply (dx,dy,dw,dh) to anchors.

    The reference never decodes RPN deltas (its proposals are raw anchors,
    proposal_utils.py:25), but the transfer model path and the "fixed"
    behavior flag need a decoder; formula follows the standard R-CNN
    parameterization with the usual log-space clamp.
    """
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = (anchors[:, 0] + anchors[:, 2]) * 0.5
    ay = (anchors[:, 1] + anchors[:, 3]) * 0.5

    dx, dy, dw, dh = deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3]
    dw = jnp.clip(dw, a_max=clip_log)
    dh = jnp.clip(dh, a_max=clip_log)

    cx = dx * aw + ax
    cy = dy * ah + ay
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=1)


def clip_boxes(boxes: jnp.ndarray, image_size: tuple[int, int]) -> jnp.ndarray:
    """Clip xyxy boxes to [0,w]x[0,h]. image_size is (h, w).

    Functional version of reference clip_boxes_to_image (box_utils.py:32-37),
    which mutates in place.
    """
    h, w = image_size
    x = jnp.clip(boxes[..., 0::2], 0.0, float(w))
    y = jnp.clip(boxes[..., 1::2], 0.0, float(h))
    out = jnp.empty_like(boxes)
    out = out.at[..., 0::2].set(x)
    out = out.at[..., 1::2].set(y)
    return out


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """Keep-mask for boxes with both sides >= min_size
    (reference filter_small_boxes, box_utils.py:39-44)."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)
