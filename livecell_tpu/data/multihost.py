"""Per-process sharded host data loading for multi-host meshes.

The reference has no distributed input path at all (single pinned GPU,
reference docker-compose.yml:24; SURVEY.md §2.7). At pod scale the
idiomatic JAX recipe is: every host process loads only the rows of each
global batch that land on its own devices, then the per-process shards
are assembled into one globally-sharded jax.Array via
`jax.make_array_from_process_local_data` — no host ever materializes the
full global batch, and the train step consumes the result exactly like a
host-fed batch (same shardings as parallel/train_step.py).

Single-process meshes degenerate to "this process loads everything",
which is how the path is exercised on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import jax
import numpy as np

from livecell_tpu.data.dataset import PackedDataset
from livecell_tpu.parallel.mesh import batch_sharding


def process_batch_slice(global_batch: int, mesh) -> Tuple[int, int]:
    """(start, count): the contiguous rows of each global batch this
    process must load.

    Batch rows are laid out over the 'data' mesh axis in device order,
    and jax mesh construction places each process's addressable devices
    contiguously along the leading axis, so equal contiguous slices per
    process line up with the shards `make_array_from_process_local_data`
    expects.
    """
    nproc = jax.process_count()
    if global_batch % nproc != 0:
        raise ValueError(
            f"global_batch={global_batch} not divisible by "
            f"process_count={nproc}")
    per = global_batch // nproc
    return jax.process_index() * per, per


def make_global_batch(mesh, images_local: np.ndarray,
                      targets_local: Dict[str, np.ndarray],
                      global_batch: int):
    """Assemble this process's local rows into globally-sharded arrays
    laid out with batch_sharding(mesh) (batch dim over 'data')."""
    sh = batch_sharding(mesh)

    def assemble(local):
        return jax.make_array_from_process_local_data(
            sh, local, (global_batch,) + local.shape[1:])

    images = assemble(images_local)
    targets = {k: assemble(v) for k, v in targets_local.items()}
    return images, targets


class ShardedLoader:
    """Deterministic per-epoch loader: every process derives the same
    global shuffle from (seed + epoch), slices out its own rows, gathers
    them from its local PackedDataset, and yields globally-sharded
    (images, targets) batches for the mesh train step."""

    def __init__(self, packed: PackedDataset, mesh, global_batch: int,
                 shuffle: bool = True, seed: int = 0):
        self.packed = packed
        self.mesh = mesh
        self.global_batch = global_batch
        self.shuffle = shuffle
        self.seed = seed
        self._lo, self._n = process_batch_slice(global_batch, mesh)

    def steps_per_epoch(self) -> int:
        return len(self.packed) // self.global_batch

    def epoch(self, epoch: int) -> Iterator[Tuple]:
        order = np.arange(len(self.packed))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        gb = self.global_batch
        for i in range(self.steps_per_epoch()):
            gidx = order[i * gb:(i + 1) * gb]
            local = gidx[self._lo:self._lo + self._n]
            images, targets = self.packed.gather(local)
            yield make_global_batch(self.mesh, images, targets, gb)
