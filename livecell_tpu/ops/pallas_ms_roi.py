"""Multiscale (FPN) RoIAlign on the Pallas single-level kernel.

The XLA formulation (ops/roi_align.py:multiscale_roi_align) gathers
4 corner pixels per bilinear tap from a flattened pyramid — for the
transfer model's training step that is ~1.6M scattered row-gathers per
image forward and the matching scatter-adds backward, the dominant
non-conv cost of the 800x1088 torchvision-parity path (reference
src/train_transfer.py; torchvision MultiScaleRoIAlign).

This module replaces those gathers with dense MXU work: every ROI is
pooled from EVERY pyramid level by the fused single-level kernel
(ops/pallas_roi_align.py — feature slab resident in VMEM, two
interpolation GEMMs per ROI block), and the per-ROI result selects the
torchvision LevelMapper level with a lane-wide `where`. Pooling each
ROI from all four levels costs ~4/3x the single-level dense FLOPs
(levels shrink 4x per step) but stays on the MXU end to end.

An earlier windowed design (one [win, win, C] dynamic-slice patch per
ROI) was measurably faster per FLOP but WRONG for elongated ROIs: the
LevelMapper invariant bounds sqrt(area)/stride, not each axis, so a
thin-but-long box (e.g. 8x300 px on P2) has taps far outside any
fixed window — 8/64 random ROIs mismatched on hardware
(/tmp r3 diag). This composition is correct by construction for any
box the single-level kernel handles (tested in
tests/test_pallas_roi_align.py and test_pallas_ms_roi.py).

Semantics match multiscale_roi_align (torchvision RoIAlign
aligned=False on the LevelMapper level; reference train_transfer.py
via torchvision MultiScaleRoIAlign). The custom VJP of the underlying
kernel differentiates features only (torchvision's CUDA backward
produces grad_input only; proposals are detached anyway).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from livecell_tpu.ops.pallas_roi_align import roi_align_pallas


def assign_levels(boxes: jnp.ndarray, canonical_size: float = 224.0,
                  canonical_level: int = 4) -> jnp.ndarray:
    """torchvision LevelMapper: k = floor(k0 + log2(sqrt(area)/224))
    clamped to [2, 5], returned as 0-based level index [B, K] i32.
    Same formula (incl. the 1e-6 eps) as ops.roi_align.
    multiscale_roi_align."""
    b = boxes.astype(jnp.float32)
    area = jnp.clip((b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1]),
                    1e-12)
    lvl = jnp.floor(canonical_level +
                    jnp.log2(jnp.sqrt(area) / canonical_size + 1e-6))
    return jnp.clip(lvl, 2, 5).astype(jnp.int32) - 2


def ms_roi_align_pallas(feats: Tuple[jnp.ndarray, ...],
                        boxes: jnp.ndarray,
                        out_size: int = 7,
                        sampling_ratio: int = 2,
                        interpret: bool = False) -> jnp.ndarray:
    """Batched fused MultiScaleRoIAlign.

    feats: 4 level maps [B, H_l, W_l, C] (P2-P5, strides 4/8/16/32),
    boxes [B, K, 4] in image coordinates. Returns
    [B, K, out_size, out_size, C] in feats[0].dtype.
    """
    lvl = assign_levels(boxes)                       # [B, K]
    out = None
    for i, f in enumerate(feats):
        o = roi_align_pallas(f, boxes, out_size, 0.25 / (2 ** i),
                             sampling_ratio, interpret)
        sel = (lvl == i)[:, :, None, None, None]
        o = jnp.where(sel, o, jnp.zeros((), o.dtype))
        out = o if out is None else out + o
    return out
