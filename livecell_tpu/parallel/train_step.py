"""Jitted training/eval steps over a device mesh.

One pjit'ed program per step: forward, all four losses, backward,
global grad-norm, optimizer update, BN running-stat update. The batch is
sharded over the 'data' mesh axis and the box-head FCs over 'model'
(see parallel/mesh.py); XLA inserts the psum/all-gathers over ICI.

Replaces the reference's train_one_epoch inner loop
(reference train_custom.py:36-82): the manual Python grad-norm loop
(train_custom.py:47-53) becomes one fused reduction, and there is no
empty_cache() dance — XLA owns memory.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from livecell_tpu.models.mask_rcnn import CustomMaskRCNN
from livecell_tpu.parallel.mesh import (
    batch_sharding, param_shardings, replicated)


def _normalize_batch(images, targets):
    """Device-side normalization of uint8-transported batches (images /255,
    mask targets /255); float inputs pass through unchanged."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    if targets is not None and targets.get("mask28") is not None and \
            targets["mask28"].dtype == jnp.uint8:
        targets = dict(targets)
        targets["mask28"] = targets["mask28"].astype(jnp.float32) / 255.0
    return images, targets


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def state_shardings(mesh, state: TrainState) -> TrainState:
    """Sharding pytree for a TrainState. param_shardings keys on parameter
    path names, so it also lays out optimizer moments (whose subtrees
    mirror the param tree, e.g. .../box_head/fc1/kernel inside adam mu)."""
    rep = replicated(mesh)
    return TrainState(
        step=rep,
        params=param_shardings(mesh, state.params),
        batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
        opt_state=param_shardings(mesh, state.opt_state),
    )


def create_train_state(model: CustomMaskRCNN, variables: Dict,
                       tx: optax.GradientTransformation,
                       mesh=None) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=opt_state)
    if mesh is not None:
        state = jax.device_put(state, state_shardings(mesh, state))
    return state


def make_step_fn(model: CustomMaskRCNN,
                 tx: optax.GradientTransformation) -> Callable:
    """Un-jitted step body: (state, images, targets, rng) ->
    (state, metrics). Shared by the host-fed train step below and the
    HBM-resident indexed step (data/device_data.py), so both paths run
    the exact same program after the batch gather."""

    def loss_fn(params, batch_stats, images, targets, rng):
        images, targets = _normalize_batch(images, targets)
        losses, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, targets, train=True,
            rngs={"sampling": rng}, mutable=["batch_stats"])
        total = sum(losses.values())
        return total, (losses, mutated["batch_stats"])

    def step(state: TrainState, images, targets, rng):
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   images, targets, rng)
        gnorm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"total_loss": total, "grad_norm": gnorm, **losses}
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt), metrics

    return step


def make_train_step(model: CustomMaskRCNN,
                    tx: optax.GradientTransformation,
                    mesh=None, donate: bool = True) -> Callable:
    """Build the jitted train step.

    step(state, images, targets, rng) -> (state, metrics) where metrics
    carries the reference loss dict plus the global gradient norm
    (train_custom.py:47-53, 67-71).
    """
    step = make_step_fn(model, tx)

    donate_args = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_args)

    cache = {}

    def sharded_step(state, images, targets, rng):
        if "fn" not in cache:
            ssh = state_shardings(mesh, state)
            bsh = batch_sharding(mesh)
            rep = replicated(mesh)
            tsh = jax.tree.map(lambda _: bsh, targets)
            # `rep` acts as a pytree prefix covering the whole metrics
            # dict, so this works for any model's loss keys.
            cache["fn"] = jax.jit(
                step, in_shardings=(ssh, bsh, tsh, rep),
                out_shardings=(ssh, rep),
                donate_argnums=donate_args)
        return cache["fn"](state, images, targets, rng)

    return sharded_step


def make_eval_step(model: CustomMaskRCNN, mesh=None) -> Callable:
    """Jitted batched inference: (params, batch_stats, images) ->
    Detections."""

    def step(params, batch_stats, images):
        images, _ = _normalize_batch(images, None)
        return model.apply({"params": params, "batch_stats": batch_stats},
                           images, train=False)

    if mesh is None:
        return jax.jit(step)

    cache = {}

    def sharded(params, batch_stats, images):
        if "fn" not in cache:
            bsh = batch_sharding(mesh)
            psh = param_shardings(mesh, params)
            rep = jax.tree.map(lambda _: replicated(mesh), batch_stats)
            cache["fn"] = jax.jit(step, in_shardings=(psh, rep, bsh))
        return cache["fn"](params, batch_stats, images)

    return sharded
