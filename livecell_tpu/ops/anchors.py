"""Anchor generation.

The reference regenerates anchors on-device every forward call
(reference anchor_generator.py:13-37, called from custom_maskrcnn.py:96-100).
Under XLA that is wasteful and needless: anchors depend only on static shape
parameters, so we build them once on host, cache them, and let jit
constant-fold the array.

Conventions match the reference exactly, including its quirky base-anchor
parameterization: for size s and ratio r, h = sqrt(s^2 / r), w = h * r
(anchor_generator.py:19-21) — i.e. the *width* carries the ratio.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np


@functools.lru_cache(maxsize=32)
def generate_anchors(
    feature_size: Tuple[int, int],
    stride: int = 4,
    sizes: Sequence[int] = (32, 64, 128),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """All anchors for a feature map, row-major over (y, x, anchor).

    Returns float32 [H*W*A, 4] xyxy, identical ordering to the reference
    (shift-major then base-anchor, anchor_generator.py:34-36).
    """
    h, w = feature_size

    base = []
    for size in sizes:
        for ratio in ratios:
            area = float(size) * float(size)
            ah = np.sqrt(area / ratio)
            aw = ah * ratio
            base.append([-aw / 2.0, -ah / 2.0, aw / 2.0, ah / 2.0])
    base = np.asarray(base, dtype=np.float32)  # [A,4]

    shifts_x = np.arange(w, dtype=np.float32) * stride
    shifts_y = np.arange(h, dtype=np.float32) * stride
    sy, sx = np.meshgrid(shifts_y, shifts_x, indexing="ij")
    shifts = np.stack([sx, sy, sx, sy], axis=2).reshape(-1, 4)  # [H*W,4]

    anchors = shifts[:, None, :] + base[None, :, :]
    return anchors.reshape(-1, 4).astype(np.float32)
