"""Fused multiscale RoIAlign kernel vs the XLA gather formulation
(interpret mode; the XLA path is itself parity-tested against
torchvision semantics in test_roi_align.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livecell_tpu.ops.pallas_ms_roi import ms_roi_align_pallas
from livecell_tpu.ops.roi_align import multiscale_roi_align


def make_pyramid(rng, b=2, h2=32, w2=48, c=8):
    feats = []
    h, w = h2, w2
    for _ in range(4):
        feats.append(jnp.asarray(
            rng.normal(size=(b, h, w, c)).astype(np.float32)))
        h, w = -(-h // 2), -(-w // 2)
    return feats


def make_boxes(rng, b, k, img_h, img_w):
    """Mixed sizes so every pyramid level is exercised."""
    out = np.zeros((b, k, 4), np.float32)
    for bi in range(b):
        for ki in range(k):
            scale = rng.choice([10, 30, 60, 100])
            x1 = rng.uniform(0, img_w - scale)
            y1 = rng.uniform(0, img_h - scale)
            out[bi, ki] = [x1, y1,
                           min(x1 + rng.uniform(4, scale), img_w),
                           min(y1 + rng.uniform(4, scale), img_h)]
    return jnp.asarray(out)


@pytest.mark.parametrize("out_size", [7, 14])
def test_ms_roi_matches_xla(rng, out_size):
    feats = make_pyramid(rng)
    img_h, img_w = 32 * 4, 48 * 4
    boxes = make_boxes(rng, 2, 12, img_h, img_w)

    got = ms_roi_align_pallas(tuple(feats), boxes, out_size, 2, True)
    want = jax.vmap(
        lambda fs, bx: multiscale_roi_align(fs, bx, out_size))(
        tuple(feats), boxes)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)


def test_ms_roi_backward_matches_xla(rng):
    feats = make_pyramid(rng, b=1)
    boxes = make_boxes(rng, 1, 8, 128, 192)

    def loss_pallas(fs):
        out = ms_roi_align_pallas(tuple(fs), boxes, 7, 2, True)
        return jnp.sum(out.astype(jnp.float32) ** 2) / 100

    def loss_xla(fs):
        out = jax.vmap(
            lambda f, bx: multiscale_roi_align(f, bx, 7))(tuple(fs), boxes)
        return jnp.sum(out.astype(jnp.float32) ** 2) / 100

    gp = jax.grad(loss_pallas)(feats)
    gx = jax.grad(loss_xla)(feats)
    for a, b in zip(gp, gx):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale,
                                   rtol=0, atol=4e-2)


def test_ms_roi_elongated_boxes(rng):
    """Thin-but-long ROIs: the LevelMapper bounds sqrt(area), not each
    axis, so a low-level ROI's long axis can span most of the canvas.
    The r3 windowed kernel design missed taps outside its fixed square
    window for exactly these (8/64 random ROIs wrong on hardware);
    the per-level dense composition must be exact."""
    feats = make_pyramid(rng, b=1, h2=40, w2=64)
    img_h, img_w = 160, 256
    boxes = jnp.asarray(np.array([[
        [4.0, 10.0, 250.0, 18.0],     # 246x8 sliver, full-width
        [30.0, 2.0, 38.0, 155.0],     # 8x153 vertical sliver
        [0.0, 0.0, 256.0, 160.0],     # whole canvas
        [100.0, 50.0, 140.0, 90.0],   # square control
    ]], np.float32))
    got = ms_roi_align_pallas(tuple(feats), boxes, 7, 2, True)
    want = jax.vmap(
        lambda fs, bx: multiscale_roi_align(fs, bx, 7))(
        tuple(feats), boxes)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)
