"""Pallas RoIAlign kernel vs the einsum reference (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livecell_tpu.ops.pallas_roi_align import roi_align_pallas
from livecell_tpu.ops.roi_align import roi_align_batched


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    b, h, w, c, k = 1, 14, 19, 128, 6       # k=6 pads to the ROI block
    feat = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    boxes = np.zeros((b, k, 4), np.float32)
    x1 = rng.uniform(0, 60, (b, k))
    y1 = rng.uniform(0, 40, (b, k))
    boxes[..., 0] = x1
    boxes[..., 1] = y1
    boxes[..., 2] = x1 + rng.uniform(5, 30, (b, k))
    boxes[..., 3] = y1 + rng.uniform(5, 30, (b, k))
    return feat, jnp.asarray(boxes)


def test_forward_matches_einsum(case):
    feat, boxes = case
    out_p = np.asarray(roi_align_pallas(feat, boxes, interpret=True))
    out_hi = np.asarray(roi_align_batched(feat, boxes, precision="highest"))
    out_df = np.asarray(roi_align_batched(
        feat.astype(jnp.bfloat16), boxes, precision="default"))
    err_p = np.abs(out_p - out_hi).max()
    err_df = np.abs(out_df - out_hi).max()
    # Same bf16-tap error class as the einsum default-precision path.
    assert err_p < 3 * max(err_df, 1e-3), (err_p, err_df)


def test_backward_matches_einsum_grad(case):
    feat, boxes = case
    g = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, boxes.shape[1], 7, 7, feat.shape[-1])).astype(np.float32))

    dp = jax.grad(lambda f: (roi_align_pallas(
        f, boxes, interpret=True) * g).sum())(feat)
    de = jax.grad(lambda f: (roi_align_batched(
        f, boxes, precision="highest") * g).sum())(feat)
    assert float(jnp.abs(dp - de).max()) < 0.1


def test_boxes_get_zero_grad(case):
    feat, boxes = case
    db = jax.grad(lambda bx: (roi_align_pallas(
        feat, bx, interpret=True) ** 2).sum())(boxes)
    assert float(jnp.abs(db).max()) == 0.0


def test_odd_k_padding(case):
    feat, boxes = case
    out = roi_align_pallas(feat, boxes[:, :3], interpret=True)
    full = roi_align_pallas(feat, boxes, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full[:, :3]),
                               atol=1e-6)
