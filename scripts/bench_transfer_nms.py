"""Measure the transfer model's RPN-NMS tail: per-level top-k 1000/1000
(torchvision parity, the default) vs a reduced 512/512.

The greedy NMS iteration count is the only sequential tail in the
transfer inference graph on TPU; this records what parity costs.

  python scripts/bench_transfer_nms.py [--steps 20]
"""

import argparse
import json
import sys
import time


def run(topk: int, steps: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from livecell_tpu.models.transfer import (
        TransferConfig, create_transfer_model)

    cfg = TransferConfig(rpn_pre_topk_per_level=topk, rpn_post_nms=topk)
    model, variables = create_transfer_model(rng=jax.random.key(0), cfg=cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(
        size=(1, cfg.tile_height, cfg.tile_width, 3)).astype(np.float32))

    @jax.jit
    def infer(v, x):
        return model.apply(v, x, train=False)

    out = jax.block_until_ready(infer(variables, images))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = infer(variables, images)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20)
    args = parser.parse_args()

    from livecell_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    results = {}
    for topk in (512, 1000):
        dt = run(topk, args.steps)
        results[f"topk_{topk}_ms"] = round(dt * 1000, 2)
        print(f"transfer inference topk={topk}: {dt * 1000:.1f} ms/tile",
              file=sys.stderr)
    results["parity_cost_ms"] = round(
        results["topk_1000_ms"] - results["topk_512_ms"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
