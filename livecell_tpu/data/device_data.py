"""HBM-resident dataset with on-device batch gather.

The reference feeds training through DataLoader worker processes and a
per-step host->device copy (reference train_custom.py:37-38,
dataset.py:95-111). On this host the tunnel to the chip is the
bottleneck, so instead the whole packed split (uint8 images + padded
instance slots, ~0.5 GB for a 100-frame split) uploads to device memory
once; every train step then receives only a [B] int32 index vector and
gathers its batch *inside* the jitted program. Per-step host traffic
drops from ~10 MB to bytes.

With a mesh the split arrays are replicated across devices and only the
index vector is sharded over 'data' — the in-program gather then yields
a batch already laid out for data parallelism, and the rest of the step
is byte-identical to parallel/train_step.py's host-fed path (they share
`make_step_fn`).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from livecell_tpu.data.dataset import PackedDataset
from livecell_tpu.models.mask_rcnn import CustomMaskRCNN
from livecell_tpu.parallel.mesh import replicated
from livecell_tpu.parallel.train_step import (
    _normalize_batch, make_step_fn, state_shardings)


class DeviceDataset:
    """A PackedDataset's full split, padded to model shapes and resident
    in device memory.

    Attributes:
      images:  [N, H, W, 3] uint8 device array (padded to the model's
               image_height/width like PackedDataset.gather).
      targets: dict of [N, ...] device arrays (boxes, labels, mask28
               uint8, valid) with max_instances slots per tile.
    """

    def __init__(self, packed: PackedDataset, mesh=None):
        self.cfg = packed.cfg
        self.mesh = mesh
        n = len(packed)
        images, targets = packed.gather(np.arange(n, dtype=np.int64))
        self.nbytes = images.nbytes + sum(v.nbytes for v in targets.values())
        if mesh is not None:
            rep = replicated(mesh)
            self.images = jax.device_put(images, rep)
            self.targets = {k: jax.device_put(v, rep)
                            for k, v in targets.items()}
        else:
            self.images = jnp.asarray(images)
            self.targets = {k: jnp.asarray(v) for k, v in targets.items()}

    def __len__(self) -> int:
        return self.images.shape[0]


def epoch_indices(n: int, batch_size: int, shuffle: bool = True,
                  seed: int = 0) -> np.ndarray:
    """[steps, batch_size] int32 index matrix for one epoch; the
    remainder that doesn't fill a batch is dropped (constant jit shape,
    like PackedDataset.batches(drop_last=True))."""
    order = np.arange(n, dtype=np.int32)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    steps = n // batch_size
    return order[:steps * batch_size].reshape(steps, batch_size)


def make_indexed_train_step(model: CustomMaskRCNN, tx,
                            dd: DeviceDataset, mesh=None,
                            donate: bool = False) -> Callable:
    """step(state, idx[B] int32, rng) -> (state, metrics).

    One jitted program: HBM gather + the shared train-step body. The
    split arrays enter as non-donated jit arguments (constant buffers
    across calls — no per-call copy, no baked-in executable constants).
    donate=True additionally donates the TrainState buffers (safe in the
    trainer's state-threading loop; off by default because callers that
    still hold the initial variables would see them deleted).
    """
    body = make_step_fn(model, tx)
    donate_args = (0,) if donate else ()

    def step(state, images_all, targets_all, idx, rng):
        images = jnp.take(images_all, idx, axis=0)
        targets = {k: jnp.take(v, idx, axis=0)
                   for k, v in targets_all.items()}
        return body(state, images, targets, rng)

    cache = {}

    def run(state, idx, rng):
        if "fn" not in cache:
            if mesh is None:
                cache["fn"] = jax.jit(step, donate_argnums=donate_args)
            else:
                ssh = state_shardings(mesh, state)
                rep = replicated(mesh)
                dsh = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("data"))
                tsh = jax.tree.map(lambda _: rep, dd.targets)
                cache["fn"] = jax.jit(
                    step,
                    in_shardings=(ssh, rep, tsh, dsh, rep),
                    out_shardings=(ssh, rep),
                    donate_argnums=donate_args)
        return cache["fn"](state, dd.images, dd.targets, idx, rng)

    return run


def make_epoch_train_fn(model: CustomMaskRCNN, tx, dd: DeviceDataset,
                        mesh=None, donate: bool = True) -> Callable:
    """epoch(state, idx_mat [S, B], rng) -> (state, metrics [S]-stacked).

    One dispatch per EPOCH: `lax.scan` over the step body with on-device
    batch gathers and per-step PRNG keys precomputed inside the program.
    The per-step dispatch path (make_indexed_train_step) costs one
    host->device round trip per step — through the tunnel that is ~25 ms
    against a ~12-23 ms device step, halving throughput. Scanning the
    whole epoch makes host traffic one [S, B] index matrix in and one
    [S]-stacked metrics dict out.

    The scan body is traced once, so compile time matches the single
    step; a different S (other split/batch size) triggers one recompile.
    """
    body = make_step_fn(model, tx)
    donate_args = (0,) if donate else ()

    def epoch_fn(state, images_all, targets_all, idx_mat, keys):
        def scan_step(st, xs):
            idx, key = xs
            images = jnp.take(images_all, idx, axis=0)
            targets = {k: jnp.take(v, idx, axis=0)
                       for k, v in targets_all.items()}
            return body(st, images, targets, key)

        return jax.lax.scan(scan_step, state, (idx_mat, keys))

    cache = {}

    def run(state, idx_mat, rng):
        keys = jax.random.split(rng, idx_mat.shape[0])
        if "fn" not in cache:
            if mesh is None:
                cache["fn"] = jax.jit(epoch_fn, donate_argnums=donate_args)
            else:
                ssh = state_shardings(mesh, state)
                rep = replicated(mesh)
                dsh = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(None, "data"))
                tsh = jax.tree.map(lambda _: rep, dd.targets)
                cache["fn"] = jax.jit(
                    epoch_fn,
                    in_shardings=(ssh, rep, tsh, dsh, rep),
                    out_shardings=(ssh, rep),
                    donate_argnums=donate_args)
        return cache["fn"](state, dd.images, dd.targets,
                           jnp.asarray(idx_mat), keys)

    return run


def make_indexed_eval_step(model: CustomMaskRCNN, dd: DeviceDataset,
                           mesh=None) -> Callable:
    """ev(params, batch_stats, idx[B]) -> (Detections, targets).

    Gathers the batch in HBM, runs batched inference, and also returns
    the (normalized, float) targets for metric computation so eval never
    re-fetches ground truth from the host.
    """

    def ev(params, batch_stats, images_all, targets_all, idx):
        images = jnp.take(images_all, idx, axis=0)
        targets = {k: jnp.take(v, idx, axis=0)
                   for k, v in targets_all.items()}
        images, targets = _normalize_batch(images, targets)
        det = model.apply({"params": params, "batch_stats": batch_stats},
                          images, train=False)
        return det, targets

    cache = {}

    def run(params, batch_stats, idx):
        if "fn" not in cache:
            if mesh is None:
                cache["fn"] = jax.jit(ev)
            else:
                from livecell_tpu.parallel.mesh import param_shardings
                rep = replicated(mesh)
                dsh = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("data"))
                cache["fn"] = jax.jit(
                    ev,
                    in_shardings=(param_shardings(mesh, params),
                                  jax.tree.map(lambda _: rep, batch_stats),
                                  rep,
                                  jax.tree.map(lambda _: rep, dd.targets),
                                  dsh))
        return cache["fn"](params, batch_stats, dd.images, dd.targets, idx)

    return run
