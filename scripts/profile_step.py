"""Profile the train step: xprof trace artifact + step MFU from the
analytic jaxpr flop count (utils/flops.py). Timing uses value-fetch
sync; the tunnel's block_until_ready returns early for this program.

Per-op time shares come from parsing the trace's vm.trace.json.gz
(thread 'XLA Ops'), not from timing ops standalone — a standalone
dispatch measures tunnel RTT, not device time.

  python scripts/profile_step.py [--bs 32] [--fixed] [--mask_samples N]
                                 [--trace outputs/xprof]
"""

import argparse
import json
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bs", type=int, default=32)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--trace", type=str, default="outputs/xprof")
    parser.add_argument("--fixed", action="store_true",
                        help="profile the fixed+decode quality mode")
    parser.add_argument("--mask_samples", type=int, default=0)
    parser.add_argument("--frozen_bn", action="store_true",
                        help="backbone BN uses running stats in train "
                             "mode (skips batch-stat reductions)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from livecell_tpu.config import ModelConfig
    from livecell_tpu.models.mask_rcnn import create_model
    from livecell_tpu.parallel.train_step import (
        create_train_state, make_train_step)
    from livecell_tpu.utils.compilation_cache import enable_compilation_cache
    from livecell_tpu.utils.profiling import trace

    enable_compilation_cache()
    cfg = ModelConfig(heads_all_images=args.fixed,
                      decode_proposals=args.fixed,
                      mask_train_samples=args.mask_samples,
                      frozen_bn=args.frozen_bn)
    model, variables = create_model(cfg, jax.random.key(0))
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    state = create_train_state(model, variables, tx)
    step_fn = make_train_step(model, tx, donate=False)

    rng = np.random.default_rng(0)
    b, h, w, i = args.bs, cfg.image_height, cfg.image_width, \
        cfg.max_instances
    images = jnp.asarray(
        (rng.uniform(size=(b, h, w, 3)) * 255).astype(np.uint8))
    boxes = np.zeros((b, i, 4), np.float32)
    boxes[:, :40] = np.stack([
        rng.uniform(0, w - 60, (b, 40)), rng.uniform(0, h - 60, (b, 40)),
        rng.uniform(20, 55, (b, 40)), rng.uniform(20, 55, (b, 40))],
        axis=2)
    boxes[:, :40, 2:] += boxes[:, :40, :2]
    valid = np.zeros((b, i), bool)
    valid[:, :40] = True
    targets = {"boxes": jnp.asarray(boxes),
               "labels": jnp.asarray(valid.astype(np.int32)),
               "mask28": jnp.asarray((rng.uniform(size=(b, i, 28, 28)) > .5
                                      ).astype(np.uint8) * 255),
               "valid": jnp.asarray(valid)}
    key = jax.random.key(1)

    state, m = step_fn(state, images, targets, key)
    float(m["total_loss"])  # value fetch: the only sync the tunnel honors
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step_fn(state, images, targets, key)
    float(m["total_loss"])
    step_ms = (time.perf_counter() - t0) / args.steps * 1000

    # Trace artifact (3 steps).
    with trace(args.trace):
        for _ in range(3):
            state, m = step_fn(state, images, targets, key)
        jax.block_until_ready(m)
    print(f"xprof trace written to {args.trace}", file=sys.stderr)

    # MFU from the analytic jaxpr flop count (XLA cost_analysis
    # over-reports ~4x on this backend).
    mfu = flops = None
    try:
        from livecell_tpu.parallel.train_step import make_step_fn
        from livecell_tpu.utils.flops import count_flops

        flops = count_flops(make_step_fn(model, tx), state, images,
                            targets, key)
        mfu = flops / (step_ms / 1000) / 197e12
    except Exception as e:
        print(f"flop count unavailable: {e}", file=sys.stderr)

    print(json.dumps({
        "step_ms": round(step_ms, 2),
        "img_per_sec": round(b / (step_ms / 1000), 1),
        "analytic_flops_per_step": flops,
        "mfu": round(mfu, 4) if mfu else None,
        "trace_dir": args.trace,
    }))


if __name__ == "__main__":
    main()
