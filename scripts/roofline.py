"""Bytes-and-FLOPs roofline for the fixed-mode train step (r5 #4).

Turns the r3/r4 assertion of a "~16 ms structural floor at bs=16"
into arithmetic: for the flagship `--fixed_heads --decode_proposals`
step this prints

  - analytic MXU FLOPs (conv+matmul jaxpr walk, utils/flops.py — the
    numerator MFU already uses),
  - XLA's post-fusion cost analysis of the COMPILED program: total
    flops, total HBM bytes accessed, and the transcendental count,
  - the two roofline times  t_mxu = F/peak_flops  and
    t_hbm = B/peak_bw,  whose max is the floor for a perfectly
    scheduled chip (overlap of MXU and HBM assumed perfect),
  - optionally the measured step time for comparison (--measure).

v5e peak: 197 TFLOP/s bf16 (394 int8), 819 GB/s HBM.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py \
      --batch_size 32 --measure
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_PEAK_BF16 = 197e12
V5E_HBM_BPS = 819e9


def build_step(cfg, batch_size: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from livecell_tpu.models.mask_rcnn import create_model
    from livecell_tpu.parallel.train_step import (
        create_train_state, make_step_fn)

    model, variables = create_model(cfg, jax.random.key(0))
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    state = create_train_state(model, variables, tx)
    body = make_step_fn(model, tx)

    rng = np.random.default_rng(0)
    b, h, w, i = batch_size, cfg.image_height, cfg.image_width, \
        cfg.max_instances
    images = jnp.asarray(
        (rng.uniform(size=(b, h, w, 3)) * 255).astype(np.uint8))
    boxes = np.zeros((b, i, 4), np.float32)
    n_inst = 40
    for bi in range(b):
        x1 = rng.uniform(0, w - 60, n_inst)
        y1 = rng.uniform(0, h - 60, n_inst)
        bw = rng.uniform(20, 55, n_inst)
        bh = rng.uniform(20, 55, n_inst)
        boxes[bi, :n_inst] = np.stack([x1, y1, x1 + bw, y1 + bh], axis=1)
    valid = np.zeros((b, i), bool)
    valid[:, :n_inst] = True
    targets = {
        "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(valid.astype(np.int32)),
        "mask28": jnp.asarray(
            (rng.uniform(size=(b, i, 28, 28)) > 0.5).astype(np.uint8) * 255),
        "valid": jnp.asarray(valid),
    }
    return body, state, images, targets


def build_transfer_step(batch_size: int, roi_backend: str = "auto"):
    """The transfer (torchvision-parity R50-FPN) train step on the
    800x1088 canvas — profile_transfer.py's workload shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from livecell_tpu.models.transfer import (TransferConfig,
                                              create_transfer_model)
    from livecell_tpu.parallel.train_step import (
        create_train_state, make_step_fn)

    model, variables = create_transfer_model(
        rng=jax.random.key(0), cfg=TransferConfig(roi_backend=roi_backend))
    c = model.cfg
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.sgd(5e-3, momentum=0.9))
    state = create_train_state(model, variables, tx)
    body = make_step_fn(model, tx)

    rng = np.random.default_rng(0)
    b, i = batch_size, c.max_instances
    th, tw = c.tile_height, c.tile_width
    images = jnp.asarray(
        (rng.uniform(size=(b, th, tw, 3)) * 255).astype(np.uint8))
    n_inst = 40
    boxes = np.zeros((b, i, 4), np.float32)
    for bi in range(b):
        x1 = rng.uniform(0, tw - 60, n_inst)
        y1 = rng.uniform(0, th - 60, n_inst)
        bw = rng.uniform(12, 55, n_inst)
        bh = rng.uniform(12, 55, n_inst)
        boxes[bi, :n_inst] = np.stack([x1, y1, x1 + bw, y1 + bh], axis=1)
    valid = np.zeros((b, i), bool)
    valid[:, :n_inst] = True
    targets = {
        "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(valid.astype(np.int32)),
        "mask28": jnp.asarray(
            (rng.uniform(size=(b, i, 28, 28)) > 0.5).astype(np.uint8) * 255),
        "valid": jnp.asarray(valid),
    }
    return body, state, images, targets


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--quirk", action="store_true",
                        help="reference-quirk mode instead of fixed mode")
    parser.add_argument("--transfer", action="store_true",
                        help="the transfer (R50-FPN, 800x1088) step "
                             "instead of the custom model")
    parser.add_argument("--measure", action="store_true",
                        help="also time the per-dispatch step")
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--stem_s2d", action="store_true",
                        help="measure with the space-to-depth stem")
    args = parser.parse_args(argv)

    import jax

    from livecell_tpu.config import ModelConfig
    from livecell_tpu.utils.flops import count_flops
    from livecell_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    if args.transfer:
        body, state, images, targets = build_transfer_step(args.batch_size)
    else:
        if args.quirk:
            cfg = ModelConfig()
        else:
            cfg = ModelConfig(heads_all_images=True, decode_proposals=True,
                              mask_train_samples=64)
        if args.stem_s2d:
            import dataclasses

            cfg = dataclasses.replace(cfg, stem_s2d=True)

        body, state, images, targets = build_step(cfg, args.batch_size)
    key = jax.random.key(1)

    analytic_flops = count_flops(body, state, images, targets, key)

    jitted = jax.jit(body, donate_argnums=(0,))
    lowered = jitted.lower(state, images, targets, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    xla_flops = float(ca.get("flops", 0.0))
    xla_bytes = float(ca.get("bytes accessed", 0.0))
    transcendentals = float(ca.get("transcendentals", 0.0))

    t_mxu_ms = analytic_flops / V5E_PEAK_BF16 * 1e3
    t_mxu_xla_ms = xla_flops / V5E_PEAK_BF16 * 1e3
    t_hbm_ms = xla_bytes / V5E_HBM_BPS * 1e3

    rec = {
        "mode": ("transfer" if args.transfer
                 else ("quirk" if args.quirk else "fixed")
                 + ("+s2d" if args.stem_s2d else "")),
        "batch_size": args.batch_size,
        "analytic_mxu_tflops": round(analytic_flops / 1e12, 4),
        "xla_total_tflops": round(xla_flops / 1e12, 4),
        "xla_hbm_gbytes": round(xla_bytes / 1e9, 4),
        "xla_transcendentals_g": round(transcendentals / 1e9, 4),
        "t_mxu_ms": round(t_mxu_ms, 3),
        "t_mxu_xla_ms": round(t_mxu_xla_ms, 3),
        "t_hbm_ms": round(t_hbm_ms, 3),
        "roofline_floor_ms": round(max(t_mxu_ms, t_hbm_ms), 3),
        "bound": "mxu" if t_mxu_ms >= t_hbm_ms else "hbm",
    }

    if args.measure:
        import numpy as np

        st = state
        for _ in range(3):
            st, metrics = jitted(st, images, targets, key)
        float(metrics["total_loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, metrics = jitted(st, images, targets, key)
        final = float(metrics["total_loss"])
        dt = (time.perf_counter() - t0) / args.steps
        assert np.isfinite(final)
        rec["measured_ms_per_dispatch"] = round(dt * 1e3, 3)
        rec["img_per_sec_per_dispatch"] = round(args.batch_size / dt, 1)
        rec["floor_fraction"] = round(
            rec["roofline_floor_ms"] / (dt * 1e3), 4)

    print(json.dumps(rec))


if __name__ == "__main__":
    main()
