"""Transfer-trainer CLI end-to-end (CPU, fake data, reduced scale) and
mesh equivalence for TransferMaskRCNN.

Covers VERDICT r2 items: transfer path with mesh + device_data +
per-epoch visualizer + COCO AP (reference train_transfer.py:346-528).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livecell_tpu.data.tiling import LIVECellPreprocessor
from tests.test_transfer import TINY, synthetic
from tests.util_fakedata import make_fake_livecell

pytestmark = pytest.mark.slow  # heavy integration tier (see pyproject.toml)


@pytest.fixture(scope="module")
def small_split(tmp_path_factory):
    # Frame 224x147 -> 96x63 tiles (3x3 mini-windows of frame//7), so
    # the stored tiles fit TINY's 96x64 model input without cropping.
    src = make_fake_livecell(tmp_path_factory.mktemp("src"),
                             images_per_split=(2, 1, 1),
                             cells_per_image=6,
                             frame_w=224, frame_h=147)
    out = tmp_path_factory.mktemp("split")
    LIVECellPreprocessor(str(src), str(out), total_images=8).preprocess()
    return out


def test_transfer_cli_end_to_end(small_split, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)

    from livecell_tpu.train.train_transfer import main

    state = main([
        "--data_dir", str(small_split), "--batch_size", "8",
        "--stage1_epochs", "1", "--stage2_epochs", "1",
        "--stage1_lr", "1e-4", "--stage2_lr", "1e-4",
        "--clip_grad_norm", "10", "--device_data", "on",
        "--visualize_every", "1", "--visualize_samples", "1",
        "--coco_ap", "--mfu",
    ], transfer_cfg=TINY)

    assert int(state.step) >= 0
    assert os.path.isdir("models/maskrcnn_resnet50_two_stage.ckpt")
    # Per-epoch prediction panels written for both stages.
    assert os.path.exists("outputs/transfer_s1e1_sample1.png")
    assert os.path.exists("outputs/transfer_s2e1_sample1.png")


def test_transfer_mesh_step_matches_single():
    """One sharded train step over the 8-device mesh computes the same
    losses as the unsharded step (data-parallel equivalence for the
    transfer model)."""
    import optax

    from livecell_tpu.models.transfer import create_transfer_model
    from livecell_tpu.parallel.mesh import make_mesh
    from livecell_tpu.parallel.train_step import (
        create_train_state, make_train_step)

    model, variables = create_transfer_model(rng=jax.random.key(0),
                                             cfg=TINY)
    images, targets = synthetic(b=8, seed=3)
    tx = optax.sgd(1e-3, momentum=0.9)

    st_single = create_train_state(model, variables, tx)
    step_single = make_train_step(model, tx, donate=False)
    key = jax.random.key(7)
    _, m_single = step_single(st_single, images, targets, key)

    mesh = make_mesh()
    st_mesh = create_train_state(model, variables, tx, mesh=mesh)
    step_mesh = make_train_step(model, tx, mesh=mesh, donate=False)
    _, m_mesh = step_mesh(st_mesh, images, targets, key)

    for k in m_single:
        # Tolerances match the custom-model sharded-vs-single tests
        # (test_device_data.py): cross-device reduction reassociation
        # in bf16 can flip a proposal in the per-level top-k, which is
        # DISCRETE in the scores — observed 0.66% on loss_classifier
        # between the two compilations; grad_norm is the most
        # selection-sensitive scalar and gets a looser gate still.
        rtol = 6e-2 if k == "grad_norm" else 2e-2
        np.testing.assert_allclose(float(m_single[k]), float(m_mesh[k]),
                                   rtol=rtol, atol=2e-3, err_msg=k)
