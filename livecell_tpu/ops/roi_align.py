"""RoIAlign as MXU einsums.

The reference invokes torchvision's C++/CUDA RoIAlign kernel
(custom_maskrcnn.py:48-50,120,177). On TPU a gather-per-sample kernel is
the wrong shape — the MXU wants dense contractions — so we express each
ROI's bilinear sampling as two small interpolation matrices (see
ops/interp.py) and contract:

    t    = einsum('kyh,hwc->kywc', Wy, feat)     # rows
    s    = einsum('kxw,kywc->kyxc', Wx, t)       # cols
    out  = avg-pool s over the sampling_ratio^2 sub-samples per bin

This is exact (same arithmetic as the CUDA kernel up to fp reassociation)
and turns ~100k scattered 4-tap gathers into two dense matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp

from livecell_tpu.ops.interp import roi_sample_matrices


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int = 7,
    spatial_scale: float = 0.25,
    sampling_ratio: int = 2,
    precision: str = "highest",
) -> jnp.ndarray:
    """RoIAlign over a single feature map.

    Args:
      features: [H, W, C] (NHWC, single image).
      boxes: [K, 4] xyxy in image coordinates.
      precision: einsum precision. "highest" reproduces the fp32 CUDA
        kernel bit-for-bit (used by the golden tests); the model's hot
        path passes "default" — with bf16 features the 3-6x MXU pass
        cost of emulated fp32 buys nothing.

    Returns:
      [K, out_size, out_size, C] pooled features.
    """
    fh, fw, c = features.shape
    k = boxes.shape[0]
    n = out_size * sampling_ratio

    wy, wx = roi_sample_matrices(
        boxes.astype(jnp.float32), (fh, fw), out_size, sampling_ratio,
        spatial_scale)

    f32 = features.astype(jnp.float32)
    t = jnp.einsum("kyh,hwc->kywc", wy, f32,
                   preferred_element_type=jnp.float32, precision=precision)
    s = jnp.einsum("kxw,kywc->kyxc", wx, t,
                   preferred_element_type=jnp.float32, precision=precision)

    s = s.reshape(k, out_size, sampling_ratio, out_size, sampling_ratio, c)
    pooled = s.mean(axis=(2, 4))
    return pooled.astype(features.dtype)


def roi_align_batched(features: jnp.ndarray, boxes: jnp.ndarray,
                      **kw) -> jnp.ndarray:
    """vmapped RoIAlign: features [B,H,W,C], boxes [B,K,4] -> [B,K,s,s,C]."""
    import jax

    return jax.vmap(lambda f, b: roi_align(f, b, **kw))(features, boxes)


def multiscale_roi_align(
    feats,
    boxes: jnp.ndarray,
    out_size: int = 7,
    sampling_ratio: int = 2,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """torchvision MultiScaleRoIAlign over an FPN pyramid, single image.

    torchvision assigns each ROI to pyramid level
    k = floor(k0 + log2(sqrt(area)/224)) clamped to [2,5] (LevelMapper)
    and runs RoIAlign(aligned=False) on that level. Rather than pooling
    every ROI from all four levels and selecting (4x waste), the four
    level maps are flattened into ONE [sum(H_l*W_l), C] buffer and each
    ROI gathers its 4 bilinear corners at per-ROI level offsets/strides —
    cost independent of both feature resolution and level choice.

    Args:
      feats: sequence of 4 [H_l, W_l, C] maps, strides 4/8/16/32 (P2-P5).
      boxes: [K, 4] xyxy in input-image coordinates.

    Returns: [K, out_size, out_size, C].
    """
    import numpy as np

    c = feats[0].shape[-1]
    hs = np.array([f.shape[0] for f in feats])
    ws = np.array([f.shape[1] for f in feats])
    offs = np.concatenate([[0], np.cumsum(hs * ws)])[:-1]
    flat = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)

    b = boxes.astype(jnp.float32)
    k = b.shape[0]
    n = out_size * sampling_ratio
    area = jnp.clip((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]), 1e-12)
    lvl = jnp.floor(canonical_level +
                    jnp.log2(jnp.sqrt(area) / canonical_size + 1e-6))
    lvl = jnp.clip(lvl, 2, 5).astype(jnp.int32) - 2            # [K] 0..3
    scale = 0.25 / jnp.exp2(lvl.astype(jnp.float32))           # [K]
    fh = jnp.asarray(hs)[lvl].astype(jnp.float32)
    fw = jnp.asarray(ws)[lvl].astype(jnp.float32)
    fw_i = jnp.asarray(ws)[lvl]
    off = jnp.asarray(offs)[lvl]

    def axis_coords(lo, hi, size):
        start = lo * scale
        length = jnp.maximum(hi * scale - start, 1.0)
        bin_sz = length / out_size
        s = jnp.arange(n, dtype=jnp.float32)
        pos = jnp.floor(s / sampling_ratio)
        frac = (s % sampling_ratio + 0.5) / sampling_ratio
        coords = start[:, None] + (pos + frac)[None, :] * bin_sz[:, None]
        valid = (coords >= -1.0) & (coords <= size[:, None])
        cc = jnp.clip(coords, 0.0, size[:, None] - 1.0)
        i0 = jnp.floor(cc).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, size[:, None].astype(jnp.int32) - 1)
        w1 = cc - i0.astype(cc.dtype)
        return i0, i1, w1, valid

    y0, y1, wy, vy = axis_coords(b[:, 1], b[:, 3], fh)   # [K, n]
    x0, x1, wx, vx = axis_coords(b[:, 0], b[:, 2], fw)

    def corner(yi, xi):
        idx = (off[:, None, None] + yi[:, :, None] * fw_i[:, None, None]
               + xi[:, None, :])                          # [K, n, n]
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(k, n, n, c)

    f00 = corner(y0, x0)
    f01 = corner(y0, x1)
    f10 = corner(y1, x0)
    f11 = corner(y1, x1)

    wy_ = (wy * vy)[:, :, None, None]
    iy_ = ((1.0 - wy) * vy)[:, :, None, None]
    wx_ = (wx * vx)[:, None, :, None]
    ix_ = ((1.0 - wx) * vx)[:, None, :, None]

    samp = (f00 * iy_ * ix_ + f01 * iy_ * wx_ +
            f10 * wy_ * ix_ + f11 * wy_ * wx_)
    samp = samp.reshape(k, out_size, sampling_ratio, out_size,
                        sampling_ratio, c)
    return samp.mean(axis=(2, 4)).astype(feats[0].dtype)


def roi_align_gather(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int = 7,
    spatial_scale: float = 0.25,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """RoIAlign via 4-tap gathers (same semantics as `roi_align`).

    The einsum formulation costs O(K * n * H * W * C) — ideal for the
    custom model's small stride-4 map, but quadratic-in-resolution for
    the transfer model's 800px-scale pyramids. This variant costs
    O(K * n^2 * 4 * C) independent of feature size: compute the sample
    coordinates, gather the four corners, and blend.
    """
    fh, fw, c = features.shape
    k = boxes.shape[0]
    n = out_size * sampling_ratio
    b = boxes.astype(jnp.float32)

    def axis_coords(lo, hi, size):
        start = lo * spatial_scale
        length = jnp.maximum(hi * spatial_scale - start, 1.0)
        bin_sz = length / out_size
        s = jnp.arange(n, dtype=jnp.float32)
        pos = jnp.floor(s / sampling_ratio)
        frac = (s % sampling_ratio + 0.5) / sampling_ratio
        coords = start[:, None] + (pos + frac)[None, :] * bin_sz[:, None]
        valid = (coords >= -1.0) & (coords <= float(size))
        cc = jnp.clip(coords, 0.0, size - 1.0)
        i0 = jnp.floor(cc).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, size - 1)
        w1 = cc - i0.astype(cc.dtype)
        return i0, i1, w1, valid

    y0, y1, wy, vy = axis_coords(b[:, 1], b[:, 3], fh)   # [K, n]
    x0, x1, wx, vx = axis_coords(b[:, 0], b[:, 2], fw)

    flat = features.reshape(fh * fw, c)

    def corner(yi, xi):
        idx = yi[:, :, None] * fw + xi[:, None, :]        # [K, n, n]
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(k, n, n, c)

    f00 = corner(y0, x0)
    f01 = corner(y0, x1)
    f10 = corner(y1, x0)
    f11 = corner(y1, x1)

    wy_ = (wy * vy)[:, :, None, None]
    iy_ = ((1.0 - wy) * vy)[:, :, None, None]
    wx_ = (wx * vx)[:, None, :, None]
    ix_ = ((1.0 - wx) * vx)[:, None, :, None]

    samp = (f00 * iy_ * ix_ + f01 * iy_ * wx_ +
            f10 * wy_ * ix_ + f11 * wy_ * wx_)
    samp = samp.reshape(k, out_size, sampling_ratio, out_size,
                        sampling_ratio, c)
    return samp.mean(axis=(2, 4)).astype(features.dtype)
