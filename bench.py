"""Headline benchmark: custom Mask R-CNN training throughput (images/sec).

Runs the full jitted train step (forward + 4 losses + backward + AdamW)
at the production tile shape (304x224 padded LIVECell tiles) on the
available accelerator and prints ONE JSON line.

Baseline note: the reference publishes no numbers (BASELINE.md). Its
training config is batch_size=2 on a ~4 GB CUDA GPU
(reference train_transfer.py:347) with a per-proposal Python loop in the
mask-loss path (mask_utils.py:110-115). REFERENCE_TRAIN_IMG_PER_SEC below
is our standing estimate of that setup's throughput pending a measured
run; vs_baseline = ours / estimate.
"""

from __future__ import annotations

import json
import time

import os

REFERENCE_TRAIN_IMG_PER_SEC = 10.0
BATCH_SIZE = int(os.environ.get("LIVECELL_BENCH_BS", "32"))
WARMUP_STEPS = 3
MEASURE_STEPS = 30


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from livecell_tpu.config import ModelConfig
    from livecell_tpu.models.mask_rcnn import create_model
    from livecell_tpu.parallel.train_step import (
        create_train_state, make_train_step)
    from livecell_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = ModelConfig()
    model, variables = create_model(cfg, jax.random.key(0))
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    state = create_train_state(model, variables, tx)
    step_fn = make_train_step(model, tx, donate=True)

    rng = np.random.default_rng(0)
    b, h, w, i = BATCH_SIZE, cfg.image_height, cfg.image_width, \
        cfg.max_instances
    # uint8 batches + on-device normalization: the production path.
    images = jnp.asarray(
        (rng.uniform(size=(b, h, w, 3)) * 255).astype(np.uint8))
    boxes = np.zeros((b, i, 4), np.float32)
    n_inst = 40
    for bi in range(b):
        x1 = rng.uniform(0, w - 60, n_inst)
        y1 = rng.uniform(0, h - 60, n_inst)
        bw = rng.uniform(20, 55, n_inst)
        bh = rng.uniform(20, 55, n_inst)
        boxes[bi, :n_inst] = np.stack(
            [x1, y1, x1 + bw, y1 + bh], axis=1)
    valid = np.zeros((b, i), bool)
    valid[:, :n_inst] = True
    targets = {
        "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(valid.astype(np.int32)),
        "mask28": jnp.asarray(
            (rng.uniform(size=(b, i, 28, 28)) > 0.5).astype(np.uint8) * 255),
        "valid": jnp.asarray(valid),
    }

    key = jax.random.key(1)
    for s in range(WARMUP_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, images, targets, sub)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for s in range(MEASURE_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, images, targets, sub)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    img_per_sec = BATCH_SIZE * MEASURE_STEPS / dt
    print(json.dumps({
        "metric": "train_images_per_sec",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / REFERENCE_TRAIN_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
