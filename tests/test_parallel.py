"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from livecell_tpu.parallel.mesh import (
    batch_sharding, make_mesh, param_shardings)
from livecell_tpu.parallel.train_step import (
    create_train_state, make_eval_step, make_train_step)
from tests.test_model import TINY, synthetic_batch

pytestmark = pytest.mark.slow  # heavy integration tier (see pyproject.toml)


@pytest.fixture(scope="module")
def setup():
    from livecell_tpu.models.mask_rcnn import create_model

    model, variables = create_model(TINY, jax.random.key(0))
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    return model, variables, tx


def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_param_shardings_split_box_head(setup):
    model, variables, _ = setup
    mesh = make_mesh(8, model_parallel=2)
    sh = param_shardings(mesh, variables["params"])
    fc1 = sh["box_head"]["fc1"]["kernel"].spec
    fc2 = sh["box_head"]["fc2"]["kernel"].spec
    assert tuple(fc1) == (None, "model")
    assert tuple(fc2) == ("model", None)
    # Backbone stays replicated.
    conv = sh["backbone"]["conv1"]["kernel"].spec
    assert all(a is None for a in conv)


def test_sharded_train_step_runs_and_matches_single(setup):
    model, variables, tx = setup
    mesh = make_mesh(8, model_parallel=2)
    images, targets = synthetic_batch(TINY, b=8)
    bsh = batch_sharding(mesh)
    images_s = jax.device_put(images, bsh)
    targets_s = {k: jax.device_put(v, bsh) for k, v in targets.items()}

    state_m = create_train_state(model, variables, tx, mesh=mesh)
    step_m = make_train_step(model, tx, mesh=mesh, donate=False)
    state_m, metrics_m = step_m(state_m, images_s, targets_s,
                                jax.random.key(5))

    state_1 = create_train_state(model, variables, tx)
    step_1 = make_train_step(model, tx, donate=False)
    state_1, metrics_1 = step_1(state_1, images, targets, jax.random.key(5))

    # Same global program, same rng -> numerically close results.
    for k in metrics_1:
        np.testing.assert_allclose(float(metrics_m[k]), float(metrics_1[k]),
                                   rtol=2e-2, atol=2e-3)
    # A sharded parameter really lives distributed across devices.
    fc1 = state_m.params["box_head"]["fc1"]["kernel"]
    assert len(fc1.sharding.device_set) == 8 or \
        tuple(fc1.sharding.spec) == (None, "model")


def test_sharded_train_step_reuses_compiled_fn(setup):
    model, variables, tx = setup
    mesh = make_mesh(8, model_parallel=1)
    images, targets = synthetic_batch(TINY, b=8)
    state = create_train_state(model, variables, tx, mesh=mesh)
    step = make_train_step(model, tx, mesh=mesh, donate=False)
    s1, _ = step(state, images, targets, jax.random.key(0))
    s2, _ = step(s1, images, targets, jax.random.key(1))
    assert int(s2.step) == 2


def test_sharded_eval_step(setup):
    model, variables, _ = setup
    mesh = make_mesh(8, model_parallel=2)
    images, _ = synthetic_batch(TINY, b=8)
    ev = make_eval_step(model, mesh=mesh)
    det = ev(variables["params"], variables["batch_stats"],
             jax.device_put(images, batch_sharding(mesh)))
    assert det.boxes.shape == (8, TINY.max_detections, 4)


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
