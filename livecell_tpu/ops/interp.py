"""Bilinear interpolation expressed as dense weight matrices.

This module is the core of the TPU-native design for the three ops the
reference delegates to CUDA kernels / per-item Python loops:

  * torchvision RoIAlign          (reference custom_maskrcnn.py:48-50)
  * GT mask crop->28x28 targets   (reference mask_utils.py:6-46, Python loop
                                   at mask_utils.py:110-115)
  * mask paste into the image     (reference custom_maskrcnn.py:265-295,
                                   mask_utils.py:129-171)

All three are 1-D separable bilinear resamplings. Instead of gathers we
build per-box interpolation weight matrices W[k, out, in] where
W[k, o, i] = relu(1 - |coord(k, o) - i|) for clamped sample coordinates —
exactly the two-tap bilinear weight, including replicate edge handling.
The resampling then becomes two einsums, which XLA lowers onto the MXU.
A boolean validity factor zeroes rows whose sample falls outside the
source (matching torch semantics case by case; see call sites).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def interp_weights(coords: jnp.ndarray, size: int,
                   valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Two-tap bilinear weights over an integer grid.

    Args:
      coords: [...] float sample coordinates (source-index space).
      size: source extent N.
      valid: optional boolean [...] mask; invalid rows become all-zero.

    Returns:
      [..., N] weights. For coords inside [0, N-1] each row has two taps
      summing to 1; coords are clamped to [0, N-1] first (replicate edges,
      the torch convention for align_corners=False and RoIAlign).
    """
    c = jnp.clip(coords, 0.0, float(size - 1))[..., None]
    idx = jnp.arange(size, dtype=coords.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(c - idx))
    if valid is not None:
        w = w * valid[..., None].astype(w.dtype)
    return w


@functools.lru_cache(maxsize=64)
def resize_weight_matrix(src: int, dst: int) -> np.ndarray:
    """Static [dst, src] matrix reproducing
    F.interpolate(mode='bilinear', align_corners=False) in 1-D.

    Used for the mask head's fixed 14->28 logit upsample
    (reference mask_head.py:52-58).
    """
    i = np.arange(dst, dtype=np.float64)
    x = (i + 0.5) * (src / dst) - 0.5
    x = np.clip(x, 0.0, src - 1)
    idx = np.arange(src, dtype=np.float64)
    w = np.maximum(0.0, 1.0 - np.abs(x[:, None] - idx[None, :]))
    return w.astype(np.float32)


def _int_trunc(x: jnp.ndarray) -> jnp.ndarray:
    """torch Tensor.int() semantics: truncate toward zero."""
    return jnp.trunc(x)


def crop_resize_matrices(
    boxes: jnp.ndarray, src_hw: Tuple[int, int], dst: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-box weight matrices for GT-mask target extraction.

    Reproduces reference extract_mask_target (mask_utils.py:6-46): the box is
    truncated to ints and clamped (x1 in [0,w-1], x2 in [x1+1, w]), the mask
    is cropped to it and bilinearly resized to dst x dst with
    align_corners=False.

    Args:
      boxes: [K,4] float xyxy.
      src_hw: (H, W) of the source masks.
      dst: output size (28).

    Returns:
      (Wy [K, dst, H], Wx [K, dst, W]) such that
      target[k] = Wy[k] @ mask[k] @ Wx[k].T
    """
    h, w = src_hw
    x1 = jnp.clip(_int_trunc(boxes[:, 0]), 0, w - 1)
    y1 = jnp.clip(_int_trunc(boxes[:, 1]), 0, h - 1)
    x2 = jnp.maximum(x1 + 1, jnp.clip(_int_trunc(boxes[:, 2]), a_max=w))
    y2 = jnp.maximum(y1 + 1, jnp.clip(_int_trunc(boxes[:, 3]), a_max=h))

    def axis_weights(lo, hi, size):
        span = hi - lo                                     # [K]
        i = jnp.arange(dst, dtype=boxes.dtype)             # [dst]
        local = (i[None, :] + 0.5) * (span[:, None] / dst) - 0.5
        local = jnp.clip(local, 0.0, span[:, None] - 1.0)
        coords = lo[:, None] + local                       # [K, dst] global
        return interp_weights(coords, size)

    wy = axis_weights(y1, y2, h)
    wx = axis_weights(x1, x2, w)
    return wy, wx


def roi_sample_matrices(
    boxes: jnp.ndarray,
    feat_hw: Tuple[int, int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 0.25,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ROI sample-point weight matrices for RoIAlign.

    torchvision RoIAlign semantics with aligned=False (the reference module's
    default, custom_maskrcnn.py:48-50): roi coords scaled by spatial_scale,
    roi side lengths floored at 1.0, `sampling_ratio` samples per bin at
    offsets (s + 0.5)/ratio, bilinear with replicate clamping, and samples
    falling outside [-1, size] contribute zero.

    Returns:
      (Wy [K, out*ratio, H], Wx [K, out*ratio, W]).
    """
    fh, fw = feat_hw
    n = out_size * sampling_ratio

    def axis_weights(lo, hi, size):
        start = lo * spatial_scale                             # [K]
        length = jnp.maximum(hi * spatial_scale - start, 1.0)  # [K]
        bin_sz = length / out_size
        s = jnp.arange(n, dtype=boxes.dtype)                   # [n]
        # sample s within bin b = s // ratio at sub-offset (s % ratio + .5)/ratio
        b = jnp.floor(s / sampling_ratio)
        frac = (s % sampling_ratio + 0.5) / sampling_ratio
        coords = start[:, None] + (b + frac)[None, :] * bin_sz[:, None]
        valid = (coords >= -1.0) & (coords <= float(size))
        return interp_weights(coords, size, valid)

    wy = axis_weights(boxes[:, 1], boxes[:, 3], fh)
    wx = axis_weights(boxes[:, 0], boxes[:, 2], fw)
    return wy, wx


def paste_matrices(
    boxes: jnp.ndarray, img_hw: Tuple[int, int], mask_size: int = 28,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-detection matrices that paste a mask_size^2 mask into the image.

    Reproduces the reference paste loop (custom_maskrcnn.py:278-293): the box
    is truncated to ints and clamped to the image, the mask is bilinearly
    resized (align_corners=False) to the box extent, and written at
    [y1:y2, x1:x2]. Boxes with empty clamped extent paste nothing.

    Returns:
      Py [K, H, mask_size], Px [K, W, mask_size], and nonempty [K] bool.
      full[k] = Py[k] @ mask28[k] @ Px[k].T  (zero outside the box).
    """
    h, w = img_hw
    x1 = jnp.maximum(0.0, _int_trunc(boxes[:, 0]))
    y1 = jnp.maximum(0.0, _int_trunc(boxes[:, 1]))
    x2 = jnp.minimum(float(w), _int_trunc(boxes[:, 2]))
    y2 = jnp.minimum(float(h), _int_trunc(boxes[:, 3]))
    nonempty = (x2 > x1) & (y2 > y1)

    def axis_weights(lo, hi, size):
        span = jnp.maximum(hi - lo, 1.0)                    # [K]
        p = jnp.arange(size, dtype=boxes.dtype)             # [size] global px
        local = p[None, :] - lo[:, None]                    # row within box
        src = (local + 0.5) * (mask_size / span[:, None]) - 0.5
        inside = (p[None, :] >= lo[:, None]) & (p[None, :] < hi[:, None])
        return interp_weights(src, mask_size, inside)

    py = axis_weights(y1, y2, h)
    px = axis_weights(x1, x2, w)
    return py, px, nonempty
