"""Profile the bs=32 train step: xprof trace artifact, step MFU from
XLA's cost model, and the RoIAlign einsums' share of step time (measured
by timing the jitted op alone at the production shape).

Closes the "Pallas-RoIAlign deferred on an unmeasured premise" item:
the einsum RoIAlign's cost share decides whether a hand kernel is worth
writing.

  python scripts/profile_step.py [--bs 32] [--trace outputs/xprof]
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
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from livecell_tpu.config import ModelConfig
    from livecell_tpu.models.mask_rcnn import create_model
    from livecell_tpu.ops.roi_align import roi_align
    from livecell_tpu.parallel.train_step import (
        create_train_state, make_train_step)
    from livecell_tpu.utils.compilation_cache import enable_compilation_cache
    from livecell_tpu.utils.profiling import trace

    enable_compilation_cache()
    cfg = ModelConfig()
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
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step_fn(state, images, targets, key)
    jax.block_until_ready(m)
    step_ms = (time.perf_counter() - t0) / args.steps * 1000

    # Trace artifact (3 steps).
    with trace(args.trace):
        for _ in range(3):
            state, m = step_fn(state, images, targets, key)
        jax.block_until_ready(m)
    print(f"xprof trace written to {args.trace}", file=sys.stderr)

    # MFU via XLA cost model.
    mfu = flops = None
    try:
        cost = step_fn.lower(state, images, targets, key) \
            .compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops:
            mfu = flops / (step_ms / 1000) / 197e12
    except Exception as e:
        print(f"cost model unavailable: {e}", file=sys.stderr)

    # RoIAlign-alone time at the production shape (B*K ROIs/step in
    # fixed mode; quirk mode uses K for image 0 only).
    feat = jnp.asarray(rng.uniform(size=(
        b, cfg.feature_height, cfg.feature_width, cfg.fpn_channels)
    ).astype(np.float32))
    rois_boxes = jnp.asarray(
        boxes[:, :cfg.train_num_samples].astype(np.float32))

    @jax.jit
    def roi_only(f, bx):
        return jax.vmap(lambda fi, bi: roi_align(
            fi, bi, cfg.roi_output_size, cfg.roi_spatial_scale,
            cfg.roi_sampling_ratio))(f, bx)

    out = jax.block_until_ready(roi_only(feat, rois_boxes))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = roi_only(feat, rois_boxes)
    jax.block_until_ready(out)
    roi_ms = (time.perf_counter() - t0) / args.steps * 1000

    print(json.dumps({
        "step_ms": round(step_ms, 2),
        "img_per_sec": round(b / (step_ms / 1000), 1),
        "flops_per_step": flops,
        "mfu": round(mfu, 4) if mfu else None,
        "roi_align_ms": round(roi_ms, 3),
        "roi_share_pct": round(100 * roi_ms / step_ms, 2),
        "trace_dir": args.trace,
    }))


if __name__ == "__main__":
    main()
