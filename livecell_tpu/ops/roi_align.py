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
) -> jnp.ndarray:
    """RoIAlign over a single feature map.

    Args:
      features: [H, W, C] (NHWC, single image).
      boxes: [K, 4] xyxy in image coordinates.

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
                   preferred_element_type=jnp.float32, precision="highest")
    s = jnp.einsum("kxw,kywc->kyxc", wx, t,
                   preferred_element_type=jnp.float32, precision="highest")

    s = s.reshape(k, out_size, sampling_ratio, out_size, sampling_ratio, c)
    pooled = s.mean(axis=(2, 4))
    return pooled.astype(features.dtype)


def roi_align_batched(features: jnp.ndarray, boxes: jnp.ndarray,
                      **kw) -> jnp.ndarray:
    """vmapped RoIAlign: features [B,H,W,C], boxes [B,K,4] -> [B,K,s,s,C]."""
    import jax

    return jax.vmap(lambda f, b: roi_align(f, b, **kw))(features, boxes)
