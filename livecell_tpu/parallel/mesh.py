"""Device mesh and sharding layout.

The reference is single-GPU (CUDA_VISIBLE_DEVICES=0, docker-compose.yml:24)
with no distributed code at all (SURVEY.md §2.7). Scaling here is the
idiomatic pjit recipe: build a Mesh, annotate data and parameter
shardings, and let XLA insert the ICI collectives.

Layout:
  * 'data' axis — batch dimension of images/targets (data parallelism;
    gradient all-reduce rides ICI).
  * 'model' axis — tensor parallelism for the only big GEMMs in the
    network: the box head's 12544x1024 and 1024x1024 FCs
    (column/row sharded); everything else is replicated.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % model_parallel != 0:
        raise ValueError(f"{n_devices} devices not divisible by "
                         f"model_parallel={model_parallel}")
    grid = devices.reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for images/targets."""
    return NamedSharding(mesh, P("data"))


def _param_spec(path: str, leaf) -> P:
    """Partition spec for one parameter by name.

    Box-head FC1 kernel [12544, 1024] is column-sharded and FC2 kernel
    [1024, 1024] row-sharded over 'model' (Megatron-style pairing: the
    intermediate activation stays sharded, XLA inserts one reduce for
    the pair).
    """
    if "box_head" in path and "fc1" in path and "kernel" in path:
        return P(None, "model")
    if "box_head" in path and "fc2" in path and "kernel" in path:
        return P("model", None)
    if "box_head" in path and "fc1" in path and "bias" in path:
        return P("model")
    return P()


def param_shardings(mesh: Mesh, params: Any):
    """NamedSharding pytree for the model variables."""

    def spec_for(path, leaf):
        name = jax.tree_util.keystr(path)
        return NamedSharding(mesh, _param_spec(name, leaf))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
