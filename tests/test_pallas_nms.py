"""Pallas NMS kernel vs the jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from livecell_tpu.ops.nms import nms_fixed
from livecell_tpu.ops.pallas_nms import nms_pallas
from tests.test_boxes import random_boxes


def test_pallas_nms_matches_jnp(rng):
    boxes = random_boxes(rng, 60, size=100)
    scores = rng.uniform(size=60).astype(np.float32)

    i_ref, v_ref = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                             0.4, 20)
    i_pl, v_pl = nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                            0.4, 20, interpret=True)
    np.testing.assert_array_equal(np.asarray(v_pl), np.asarray(v_ref))
    kept_ref = np.asarray(i_ref)[np.asarray(v_ref)]
    kept_pl = np.asarray(i_pl)[np.asarray(v_pl)]
    np.testing.assert_array_equal(kept_pl, kept_ref)


def test_pallas_nms_validity(rng):
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, val = nms_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 3,
                          valid=jnp.asarray([False, True, True]),
                          interpret=True)
    got = np.asarray(idx)[np.asarray(val)]
    assert got.tolist() == [1, 2]


def test_pallas_nms_all_invalid(rng):
    boxes = np.zeros((4, 4), np.float32)
    scores = np.zeros(4, np.float32)
    _, val = nms_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 4,
                        valid=jnp.zeros(4, bool), interpret=True)
    assert not np.asarray(val).any()
