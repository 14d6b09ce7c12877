"""RoIAlign einsum formulation vs a scalar transcription of the
torchvision CUDA kernel (aligned=False), the op the reference uses at
custom_maskrcnn.py:48-50."""

import jax.numpy as jnp
import numpy as np

from livecell_tpu.ops.roi_align import roi_align, roi_align_batched


def bilinear_sample(feat, y, x):
    """torchvision roi_align_kernel bilinear_interpolate, aligned=False."""
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[2], feat.dtype)
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return (feat[y0, x0] * (1 - ly) * (1 - lx) + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx) + feat[y1, x1] * ly * lx)


def reference_roi_align(feat, boxes, out_size=7, scale=0.25, ratio=2):
    k = len(boxes)
    c = feat.shape[2]
    out = np.zeros((k, out_size, out_size, c), np.float32)
    for ki, (x1, y1, x2, y2) in enumerate(boxes):
        sx, sy = x1 * scale, y1 * scale
        rw = max(x2 * scale - sx, 1.0)
        rh = max(y2 * scale - sy, 1.0)
        bw, bh = rw / out_size, rh / out_size
        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(c, np.float32)
                for iy in range(ratio):
                    for ix in range(ratio):
                        y = sy + i * bh + (iy + 0.5) * bh / ratio
                        x = sx + j * bw + (ix + 0.5) * bw / ratio
                        acc += bilinear_sample(feat, y, x)
                out[ki, i, j] = acc / (ratio * ratio)
    return out


def test_roi_align_matches_reference(rng):
    feat = rng.standard_normal((20, 30, 8)).astype(np.float32)
    boxes = np.array([
        [4.0, 8.0, 60.0, 70.0],
        [0.0, 0.0, 120.0, 80.0],     # full image at scale .25
        [100.0, 60.0, 118.0, 79.0],  # near bottom-right
        [2.0, 2.0, 3.0, 3.0],        # tiny -> clamped to 1.0 roi side
        [-8.0, -8.0, 10.0, 10.0],    # negative corner
    ], dtype=np.float32)

    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes)))
    want = reference_roi_align(feat, boxes)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_batched_shapes(rng):
    feat = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    boxes = rng.uniform(0, 60, (2, 5, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2]
    out = roi_align_batched(jnp.asarray(feat), jnp.asarray(boxes))
    assert out.shape == (2, 5, 7, 7, 4)


def test_roi_align_bf16_input_precision(rng):
    feat = rng.standard_normal((12, 12, 4)).astype(np.float32)
    boxes = np.array([[4.0, 4.0, 40.0, 40.0]], np.float32)
    f32 = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes)))
    bf = np.asarray(roi_align(jnp.asarray(feat, jnp.bfloat16),
                              jnp.asarray(boxes)).astype(jnp.float32))
    np.testing.assert_allclose(bf, f32, rtol=0.05, atol=0.05)


def test_roi_align_gather_matches_einsum(rng):
    from livecell_tpu.ops.roi_align import roi_align_gather

    feat = rng.standard_normal((20, 30, 8)).astype(np.float32)
    boxes = np.array([
        [4.0, 8.0, 60.0, 70.0],
        [0.0, 0.0, 120.0, 80.0],
        [100.0, 60.0, 118.0, 79.0],
        [2.0, 2.0, 3.0, 3.0],
        [-8.0, -8.0, 10.0, 10.0],
    ], dtype=np.float32)
    a = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes)))
    g = np.asarray(roi_align_gather(jnp.asarray(feat), jnp.asarray(boxes)))
    np.testing.assert_allclose(g, a, rtol=1e-4, atol=1e-4)
