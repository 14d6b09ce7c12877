"""Explainer stage coverage: all 12 reference hook points are captured
(reference explain_predictions.py:27-51) and the dashboard renders."""

import jax
import numpy as np
import pytest

from livecell_tpu.models.mask_rcnn import create_model
from livecell_tpu.serve.explain import (
    STAGE_KEYS, capture_activations, explain_image, importance_percentages,
    _fetch)
from tests.test_model import TINY


@pytest.fixture(scope="module")
def tiny_model():
    return create_model(TINY, jax.random.key(0))


def test_all_twelve_stages_captured(tiny_model):
    model, variables = tiny_model
    img = np.random.default_rng(0).uniform(
        size=(TINY.image_height, TINY.image_width, 3)).astype(np.float32)
    det, inter = capture_activations(model, variables, img)
    inter = inter.get("intermediates", inter)
    acts = {name: _fetch(inter, path) for name, path in STAGE_KEYS}
    missing = [k for k, v in acts.items() if v is None]
    assert not missing, f"stages not captured: {missing}"
    assert len(acts) == 12
    imp = importance_percentages(acts)
    assert len(imp) == 12
    assert abs(sum(imp.values()) - 100.0) < 1e-3


def test_dashboard_renders(tiny_model, tmp_path):
    model, variables = tiny_model
    rng = np.random.default_rng(1)
    img = (rng.uniform(size=(TINY.image_height, TINY.image_width, 3))
           * 255).astype(np.uint8)
    gt = np.array([[5, 5, 40, 40], [30, 20, 80, 55]], np.float32)
    out = explain_image(model, variables, img, gt,
                        str(tmp_path / "dash.png"))
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 10000
