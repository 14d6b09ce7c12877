"""Fused anchor-GT matcher kernel vs the XLA reference (interpret mode).

The kernel must match jnp argmax semantics (same first-index
tie-breaks, -1 masking of invalid GT — reference rpn.py:72-85 matching
rules) and the reference target encode (box_utils.py:4-28).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livecell_tpu.ops.boxes import box_iou, encode_boxes
from livecell_tpu.ops.pallas_match import (
    match_anchors_pallas, match_anchors_xla)


def _case(rng, n, b, i, valid_frac=0.6):
    anchors = np.zeros((n, 4), np.float32)
    anchors[:, 0] = rng.uniform(0, 200, n)
    anchors[:, 1] = rng.uniform(0, 150, n)
    anchors[:, 2] = anchors[:, 0] + rng.uniform(4, 80, n)
    anchors[:, 3] = anchors[:, 1] + rng.uniform(4, 80, n)
    gt = np.zeros((b, i, 4), np.float32)
    gt[..., 0] = rng.uniform(0, 200, (b, i))
    gt[..., 1] = rng.uniform(0, 150, (b, i))
    gt[..., 2] = gt[..., 0] + rng.uniform(5, 60, (b, i))
    gt[..., 3] = gt[..., 1] + rng.uniform(5, 60, (b, i))
    valid = rng.uniform(size=(b, i)) < valid_frac
    return (jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(valid))


@pytest.mark.parametrize("n,b,i", [(700, 2, 16), (1200, 1, 130)])
def test_matches_xla(rng, n, b, i):
    anchors, gt, valid = _case(rng, n, b, i)
    mx_p, tgt_p, ba_p = match_anchors_pallas(
        anchors, gt, valid, interpret=True)
    # Jit the reference too: interpret-mode pallas lowers to the same
    # XLA elementwise ops, so under identical compilation the float
    # results agree to rounding; unjitted eager mode differs by ~1 ulp
    # through FMA fusion.
    mx_x, tgt_x, ba_x = jax.jit(
        match_anchors_xla, static_argnames=("full",))(anchors, gt, valid)
    np.testing.assert_allclose(np.asarray(mx_p), np.asarray(mx_x),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tgt_p), np.asarray(tgt_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ba_p), np.asarray(ba_x))


def test_max_only_variant(rng):
    anchors, gt, valid = _case(rng, 600, 2, 24)
    mx_p = match_anchors_pallas(anchors, gt, valid, full=False,
                                interpret=True)
    mx_x = jax.jit(match_anchors_xla, static_argnames=("full",))(
        anchors, gt, valid, full=False)
    np.testing.assert_allclose(np.asarray(mx_p), np.asarray(mx_x),
                               rtol=0, atol=1e-6)


def test_all_invalid_gt(rng):
    anchors, gt, _ = _case(rng, 520, 1, 12)
    valid = jnp.zeros((1, 12), bool)
    mx, tgt, ba = match_anchors_pallas(anchors, gt, valid, interpret=True)
    assert float(jnp.max(mx)) == -1.0
    # argmax over an all(-1) row/col is index 0, as in jnp.
    np.testing.assert_array_equal(np.asarray(ba), 0)
    np.testing.assert_allclose(
        np.asarray(tgt),
        np.asarray(encode_boxes(jnp.broadcast_to(gt[0, 0], (520, 4)),
                                anchors).T)[None], rtol=1e-5, atol=1e-5)


def test_xla_matches_gather_form(rng):
    """The one-hot matmul form must equal the plain gather form."""
    anchors, gt, valid = _case(rng, 800, 2, 20)
    mx, tgt, ba = match_anchors_xla(anchors, gt, valid)

    for b in range(2):
        ious = jnp.where(valid[b][None, :], box_iou(anchors, gt[b]), -1.0)
        np.testing.assert_array_equal(np.asarray(mx[b]),
                                      np.asarray(ious.max(axis=1)))
        np.testing.assert_allclose(
            np.asarray(tgt[b]),
            np.asarray(encode_boxes(gt[b][ious.argmax(axis=1)],
                                    anchors).T),
            rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ba[b]),
                                      np.asarray(ious.argmax(axis=0)))
