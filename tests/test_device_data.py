"""HBM-resident dataset unit tests (CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from livecell_tpu.data.device_data import (
    DeviceDataset, epoch_indices, make_indexed_eval_step,
    make_indexed_train_step)
from livecell_tpu.data.tiling import LIVECellPreprocessor
from livecell_tpu.config import ModelConfig
from livecell_tpu.data.dataset import PackedDataset
from tests.test_model import TINY
from tests.util_fakedata import make_fake_livecell


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    src = make_fake_livecell(tmp_path_factory.mktemp("src"),
                             images_per_split=(2, 1, 1))
    out = tmp_path_factory.mktemp("split")
    LIVECellPreprocessor(str(src), str(out), total_images=8).preprocess()
    cfg = dataclasses.replace(TINY, max_instances=32)
    return PackedDataset(str(out), "train", cfg)


def test_device_gather_matches_host(packed):
    dd = DeviceDataset(packed)
    idx = np.array([0, 5, 17, 33], np.int32)
    images, targets = packed.gather(idx)
    assert np.array_equal(np.asarray(dd.images[jnp.asarray(idx)]), images)
    for k in targets:
        assert np.array_equal(np.asarray(dd.targets[k][jnp.asarray(idx)]),
                              targets[k]), k


def test_epoch_indices_cover_all():
    m = epoch_indices(50, 8, shuffle=True, seed=3)
    assert m.shape == (6, 8)
    assert len(set(m.reshape(-1).tolist())) == 48
    # Deterministic per seed.
    assert (epoch_indices(50, 8, True, 3) == m).all()
    assert not (epoch_indices(50, 8, True, 4) == m).all()


def test_indexed_step_matches_host_step(packed):
    from livecell_tpu.models.mask_rcnn import create_model
    from livecell_tpu.parallel.train_step import (
        create_train_state, make_train_step)

    cfg = packed.cfg
    model, variables = create_model(cfg, jax.random.key(0))
    tx = optax.adamw(1e-3)
    dd = DeviceDataset(packed)
    state = create_train_state(model, variables, tx)
    idx = np.array([1, 2, 9, 30], np.int32)
    images, targets = packed.gather(idx)

    host = make_train_step(model, tx, donate=False)
    indexed = make_indexed_train_step(model, tx, dd)
    _, m1 = host(state, jnp.asarray(images),
                 {k: jnp.asarray(v) for k, v in targets.items()},
                 jax.random.key(9))
    _, m2 = indexed(state, jnp.asarray(idx), jax.random.key(9))
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_indexed_eval_step(packed):
    from livecell_tpu.models.mask_rcnn import create_model

    model, variables = create_model(packed.cfg, jax.random.key(0))
    dd = DeviceDataset(packed)
    ev = make_indexed_eval_step(model, dd)
    det, targets = ev(variables["params"], variables["batch_stats"],
                      jnp.asarray(np.array([0, 1], np.int32)))
    assert det.boxes.shape == (2, packed.cfg.max_detections, 4)
    assert targets["mask28"].dtype == jnp.float32
