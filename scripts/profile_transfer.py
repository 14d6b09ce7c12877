"""Profile the TRANSFER train step (torchvision-parity R50-FPN
Mask R-CNN on the 800x1088 canvas, models/transfer.py): xprof trace +
value-fetch step time + analytic MFU — the transfer-path twin of
scripts/profile_step.py.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_transfer.py \
      [--bs 4] [--trace outputs/xprof_transfer]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bs", type=int, default=4)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--trace", type=str, default="outputs/xprof_transfer")
    parser.add_argument("--roi_backend", default="auto",
                        choices=["auto", "pallas", "xla"])
    parser.add_argument("--frozen_bn", action="store_true",
                        help="torchvision FrozenBatchNorm2d semantics "
                             "(the reference's pretrained backbone)")
    parser.add_argument("--scan", action="store_true",
                        help="time the one-dispatch lax.scan program "
                             "(the --device_data production shape)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from livecell_tpu.models.transfer import create_transfer_model
    from livecell_tpu.parallel.train_step import (
        create_train_state, make_step_fn, make_train_step)
    from livecell_tpu.utils.compilation_cache import enable_compilation_cache
    from livecell_tpu.utils.flops import count_flops
    from livecell_tpu.utils.profiling import trace

    enable_compilation_cache()
    from livecell_tpu.models.transfer import TransferConfig
    model, variables = create_transfer_model(
        rng=jax.random.key(0),
        cfg=TransferConfig(roi_backend=args.roi_backend,
                           frozen_bn=args.frozen_bn))
    c = model.cfg
    # From random init (no pretrained weights reachable here) the
    # transfer step needs gradient clipping to stay finite — same as
    # the trainer's --clip_grad_norm guidance.
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.sgd(5e-3, momentum=0.9))
    state = create_train_state(model, variables, tx)
    step_fn = make_train_step(model, tx, donate=False)

    rng = np.random.default_rng(0)
    b, i = args.bs, c.max_instances
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

    key = jax.random.key(1)
    if args.scan:
        # The production --device_data shape: one dispatch scans all
        # steps (r3: the per-step dispatch gap is ~50 ms/step on this
        # 200 ms program through the tunnel).
        body = make_step_fn(model, tx)

        @jax.jit
        def epoch_fn(st, keys):
            return jax.lax.scan(
                lambda s, kk: body(s, images, targets, kk), st, keys)

        state, metrics = epoch_fn(state, jax.random.split(key, args.steps))
        float(metrics["total_loss"][-1])  # compile + drain
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        st, metrics = epoch_fn(state, jax.random.split(sub, args.steps))
        final = float(metrics["total_loss"][-1])
        dt = (time.perf_counter() - t0) / args.steps
    else:
        state, metrics = step_fn(state, images, targets, key)
        float(metrics["total_loss"])  # compile + drain

        t0 = time.perf_counter()
        st = state
        for _ in range(args.steps):
            key, sub = jax.random.split(key)
            st, metrics = step_fn(st, images, targets, sub)
        final = float(metrics["total_loss"])
        dt = (time.perf_counter() - t0) / args.steps
    assert np.isfinite(final)

    flops = None
    try:
        flops = count_flops(make_step_fn(model, tx), state, images,
                            targets, key)
    except Exception:
        pass

    if args.trace:
        with trace(args.trace):
            for _ in range(3):
                key, sub = jax.random.split(key)
                st, metrics = step_fn(st, images, targets, sub)
            float(metrics["total_loss"])
        print(f"xprof trace written to {args.trace}")

    rec = {"step_ms": round(dt * 1e3, 2),
           "img_per_sec": round(b / dt, 1)}
    if flops:
        rec["analytic_flops_per_step"] = flops
        rec["mfu"] = round(flops / dt / 197e12, 4)
    rec["trace_dir"] = args.trace
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
