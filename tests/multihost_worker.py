"""One process of a multi-process CPU mesh, driven by
tests/test_multihost_procs.py.

Each worker owns 4 virtual CPU devices; jax.distributed.initialize
joins them into one 8-device job, validating the real
`jax.process_count() > 1` path of data/multihost.py — in particular
`process_batch_slice`'s assumption that each process's addressable
devices are contiguous along the mesh's leading ('data') axis.

Not a pytest module (no test_ prefix): run as
    python tests/multihost_worker.py --process_id I --num_processes N \
        --port P --data_dir DIR --out OUT.json
"""

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--strict", action="store_true",
                   help="use strict_equivalence_config (f32/exact/frozen "
                        "BN) for the deterministic cross-process gate")
    args = p.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=4")
    import jax

    # The axon plugin's sitecustomize overrides JAX_PLATFORMS; force the
    # platform through jax.config after import (same as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes, process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == 4

    import dataclasses

    import jax.numpy as jnp  # noqa: F401
    import optax

    from livecell_tpu.data.dataset import PackedDataset
    from livecell_tpu.data.multihost import (
        ShardedLoader, process_batch_slice)
    from livecell_tpu.models.mask_rcnn import create_model
    from livecell_tpu.parallel.mesh import make_mesh
    from livecell_tpu.parallel.train_step import (
        create_train_state, make_train_step)
    from tests.test_model import TINY

    cfg = dataclasses.replace(TINY, max_instances=32)
    if args.strict:
        from livecell_tpu.config import strict_equivalence_config

        cfg = strict_equivalence_config(cfg)
    packed = PackedDataset(args.data_dir, "train", cfg)
    mesh = make_mesh(8, model_parallel=1)

    global_batch = 8
    lo, n = process_batch_slice(global_batch, mesh)
    per = global_batch // args.num_processes
    assert (lo, n) == (args.process_id * per, per), (lo, n)

    loader = ShardedLoader(packed, mesh, global_batch=global_batch,
                           shuffle=True, seed=3)
    images, targets = next(iter(loader.epoch(0)))
    assert images.shape[0] == global_batch
    assert len(images.sharding.device_set) == 8

    model, variables = create_model(cfg, jax.random.key(0))
    tx = optax.adamw(1e-3)
    state = create_train_state(model, variables, tx, mesh=mesh)
    step = make_train_step(model, tx, mesh=mesh, donate=False)
    state, metrics = step(state, images, targets, jax.random.key(1))
    record = {k: float(v) for k, v in metrics.items()}
    record["process_index"] = jax.process_index()
    record["slice"] = [lo, n]
    with open(args.out, "w") as f:
        json.dump(record, f)
    print(f"worker {args.process_id} done: {record}", flush=True)


if __name__ == "__main__":
    main()
