"""Headline benchmark: custom Mask R-CNN training throughput (images/sec).

Runs the full jitted train step (forward + 4 losses + backward + AdamW)
at the production tile shape (304x224 padded LIVECell tiles) on the
available accelerator and prints ONE JSON line.

Baseline provenance: the reference publishes no numbers (BASELINE.md) and
this image has no GPU, so two anchors are reported:
  * measured_cpu_baseline — images/sec of the reference model's train
    step MEASURED here, via the step-parity-tested torch transcription
    (tests/torch_ref/, validated against our losses+grads in
    tests/test_parity_torch.py) at the reference config (batch_size=2,
    train_custom.py:212-219) on this host's CPU. Cached in
    outputs/baseline_torch_cpu.json.
  * gpu_estimate — a literature-scale estimate for the reference's
    actual 4 GB CUDA setup (train_transfer.py:347), kept only for
    context: ~10 img/s.
vs_baseline = ours / gpu_estimate (the conservative comparison);
vs_cpu_baseline = ours / measured_cpu_baseline.

Timing methodology: the measured loop ends with a host fetch of the last
step's scalar loss, NOT just block_until_ready — on the axon tunnel
block_until_ready returns before execution finishes (it reported a
step rate 4.5x over the chip's theoretical bf16 peak). A value fetch
cannot lie: the scalar only exists after the whole chained program ran.
MFU is computed from an analytic jaxpr walk of the step's conv+matmul
FLOPs (livecell_tpu/utils/flops.py) against the v5e bf16 peak; XLA's
cost_analysis() over-reports on this backend.
"""

from __future__ import annotations

import json
import sys
import time

import os

REFERENCE_GPU_EST_IMG_PER_SEC = 10.0
V5E_PEAK_BF16_FLOPS = 197e12
BATCH_SIZE = int(os.environ.get("LIVECELL_BENCH_BS", "32"))
WARMUP_STEPS = 3
MEASURE_STEPS = 30
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "outputs", "baseline_torch_cpu.json")


def measure_torch_cpu_baseline(steps: int = 3) -> dict:
    """Measured floor: the reference train step on this host's CPU via
    the parity-tested torch transcription, at the reference config
    (batch_size=2, AdamW 1e-3/1e-4, full 304x224 padded tile)."""
    if os.path.exists(BASELINE_CACHE) and not os.environ.get(
            "LIVECELL_BENCH_REMEASURE"):
        with open(BASELINE_CACHE) as f:
            return json.load(f)

    import numpy as np
    import torch

    from tests.torch_ref.reference_model import RefMaskRCNN

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    b, h, w, n_inst = 2, 224, 304, 40
    model = RefMaskRCNN()
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=1e-4)
    images = torch.from_numpy(
        rng.uniform(size=(b, 3, h, w)).astype(np.float32))
    targets = []
    for bi in range(b):
        x1 = rng.uniform(0, w - 60, n_inst)
        y1 = rng.uniform(0, h - 60, n_inst)
        bw = rng.uniform(20, 55, n_inst)
        bh = rng.uniform(20, 55, n_inst)
        boxes = np.stack([x1, y1, x1 + bw, y1 + bh], 1).astype(np.float32)
        masks = (rng.uniform(size=(n_inst, h, w)) > 0.5).astype(np.float32)
        targets.append({"boxes": torch.from_numpy(boxes),
                        "masks": torch.from_numpy(masks)})

    def one_step():
        losses = model(images, targets)
        opt.zero_grad()
        sum(losses.values()).backward()
        opt.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    result = {
        "img_per_sec": round(b * steps / dt, 3),
        "batch_size": b, "steps": steps,
        "sec_per_step": round(dt / steps, 3),
        "device": "cpu",
        "torch_threads": torch.get_num_threads(),
        "note": "reference train step via parity-tested torch "
                "transcription (tests/test_parity_torch.py)",
    }
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump(result, f, indent=1)
    return result


def measure_step(cfg, batch_size: int, steps: int = MEASURE_STEPS,
                 scan: bool = True):
    """Value-fetch-timed training throughput at `cfg`; returns (img/s,
    mfu, tflop/step).

    scan=True measures the production `--device_data` path: one jitted
    program that `lax.scan`s the step body over in-HBM batch gathers
    (data/device_data.py:make_epoch_train_fn) — one dispatch for all
    `steps`. scan=False measures one dispatch per step; through the
    axon tunnel each dispatch costs ~2.4 ms that does NOT pipeline
    (r3 xprof: 22.9 ms wall vs 20.5 ms device), so the per-step number
    under-reports what training actually achieves."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from livecell_tpu.models.mask_rcnn import create_model
    from livecell_tpu.parallel.train_step import (
        create_train_state, make_step_fn, make_train_step)
    from livecell_tpu.utils.flops import count_flops

    model, variables = create_model(cfg, jax.random.key(0))
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    state = create_train_state(model, variables, tx)
    step_fn = make_train_step(model, tx, donate=True)

    rng = np.random.default_rng(0)
    b, h, w, i = batch_size, cfg.image_height, cfg.image_width, \
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
    if scan:
        # Production --device_data shape: a [N, ...] HBM-resident pool,
        # the program gathers each step's batch by index and scans the
        # shared step body (same program as make_epoch_train_fn).
        n_pool = batch_size * 4
        reps = -(-n_pool // b)
        images_all = jnp.tile(images, (reps, 1, 1, 1))[:n_pool]
        targets_all = {k: jnp.tile(
            v, (reps,) + (1,) * (v.ndim - 1))[:n_pool]
            for k, v in targets.items()}
        body = make_step_fn(model, tx)

        @jax.jit
        def epoch_fn(st, imgs, tgts, idx_mat, keys):
            def scan_step(s, xs):
                idx, kk = xs
                im = jnp.take(imgs, idx, axis=0)
                tg = {k: jnp.take(v, idx, axis=0) for k, v in tgts.items()}
                return body(s, im, tg, kk)
            return jax.lax.scan(scan_step, st, (idx_mat, keys))

        idx_rng = np.random.default_rng(2)
        def idx_mat(s):
            return jnp.asarray(idx_rng.integers(
                0, n_pool, size=(s, batch_size), dtype=np.int32))

        key, k_warm, k_meas = jax.random.split(key, 3)
        # Warmup with the same scan length so only one program compiles.
        state, metrics = epoch_fn(state, images_all, targets_all,
                                  idx_mat(steps),
                                  jax.random.split(k_warm, steps))
        float(metrics["total_loss"][-1])  # drain for real
        mat = idx_mat(steps)
        keys = jax.random.split(k_meas, steps)
        t0 = time.perf_counter()
        state, metrics = epoch_fn(state, images_all, targets_all,
                                  mat, keys)
        final_loss = float(metrics["total_loss"][-1])
        dt = time.perf_counter() - t0
        assert np.isfinite(final_loss)
    else:
        for s in range(WARMUP_STEPS):
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, images, targets, sub)
        float(metrics["total_loss"])  # drain the pipeline for real

        t0 = time.perf_counter()
        for s in range(steps):
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, images, targets, sub)
        # Fetch a scalar that transitively depends on every measured
        # step — the only sync the tunnel can't acknowledge early.
        final_loss = float(metrics["total_loss"])
        dt = time.perf_counter() - t0
        assert np.isfinite(final_loss)

    img_per_sec = b * steps / dt
    sec_per_step = dt / steps

    # MFU from the analytic conv+matmul flop count of the step.
    mfu = flops = None
    try:
        flops = count_flops(make_step_fn(model, tx), state, images,
                            targets, key)
        mfu = round(flops / sec_per_step / V5E_PEAK_BF16_FLOPS, 4)
    except Exception:
        pass
    return img_per_sec, mfu, flops


TRANSFER_BATCH_SIZE = int(os.environ.get("LIVECELL_BENCH_TRANSFER_BS", "4"))


def measure_transfer_step(steps: int = 10):
    """Transfer-path throughput on the epoch-scan dispatch shape
    (reference src/train_transfer.py:397-479 hot loop): img/s + MFU."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from livecell_tpu.models.transfer import (TransferConfig,
                                              create_transfer_model)
    from livecell_tpu.parallel.train_step import (
        create_train_state, make_step_fn)
    from livecell_tpu.utils.flops import count_flops

    model, variables = create_transfer_model(
        rng=jax.random.key(0), cfg=TransferConfig())
    c = model.cfg
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.sgd(5e-3, momentum=0.9))
    state = create_train_state(model, variables, tx)

    rng = np.random.default_rng(0)
    b, i = TRANSFER_BATCH_SIZE, c.max_instances
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

    body = make_step_fn(model, tx)

    @jax.jit
    def epoch_fn(st, keys):
        return jax.lax.scan(
            lambda s, kk: body(s, images, targets, kk), st, keys)

    key = jax.random.key(1)
    state, metrics = epoch_fn(state, jax.random.split(key, steps))
    float(metrics["total_loss"][-1])  # compile + drain
    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    state, metrics = epoch_fn(state, jax.random.split(sub, steps))
    final = float(metrics["total_loss"][-1])
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(final)

    mfu = None
    try:
        flops = count_flops(body, state, images, targets, key)
        mfu = round(flops / dt / V5E_PEAK_BF16_FLOPS, 4)
    except Exception:
        pass
    return TRANSFER_BATCH_SIZE / dt, mfu


def main():
    import jax

    from livecell_tpu.config import ModelConfig
    from livecell_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    # Headline: the reference's own training semantics (quirk mode),
    # measured on the production epoch-scan (--device_data) path.
    img_per_sec, mfu, flops = measure_step(ModelConfig(), BATCH_SIZE)
    try:
        # Secondary: one dispatch per step (host-fed loader path).
        disp_img_per_sec, _, _ = measure_step(
            ModelConfig(), BATCH_SIZE, scan=False)
    except Exception:
        disp_img_per_sec = None

    # Secondary: the flagship quality mode (every quirk fixed, Pallas
    # RoIAlign, fg-subset mask head) at its tuned batch size.
    try:
        fixed_cfg = ModelConfig(heads_all_images=True,
                                decode_proposals=True,
                                mask_train_samples=64)
        # bs=32 measured faster per image than 16 (r3: 733.5 vs 717.6
        # img/s) — fixed overheads amortize across the bigger batch.
        fixed_bs = int(os.environ.get("LIVECELL_BENCH_FIXED_BS", "32"))
        fixed_img_per_sec, fixed_mfu, _ = measure_step(fixed_cfg, fixed_bs)
        fixed_mode_error = None
    except Exception as e:
        # Surface a flagship-config regression instead of dropping it.
        import traceback
        traceback.print_exc(file=sys.stderr)
        fixed_img_per_sec = fixed_mfu = None
        fixed_mode_error = f"{type(e).__name__}: {e}"

    # Secondary: the transfer train step (torchvision-parity R50-FPN on
    # the 800x1088 canvas, reference src/train_transfer.py:397-479) on
    # the same epoch-scan dispatch shape.
    try:
        transfer_img_per_sec, transfer_mfu = measure_transfer_step()
        transfer_error = None
    except Exception as e:
        import traceback
        traceback.print_exc(file=sys.stderr)
        transfer_img_per_sec = transfer_mfu = None
        transfer_error = f"{type(e).__name__}: {e}"

    try:
        baseline = measure_torch_cpu_baseline()
    except Exception as e:  # torch missing etc. — never break the bench
        baseline = {"img_per_sec": None, "error": str(e)}

    record = {
        "metric": "train_images_per_sec",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / REFERENCE_GPU_EST_IMG_PER_SEC, 2),
        "baseline_provenance": "gpu_estimate",
        "gpu_estimate_img_per_sec": REFERENCE_GPU_EST_IMG_PER_SEC,
        "measured_cpu_baseline": baseline.get("img_per_sec"),
        "batch_size": BATCH_SIZE,
        "dispatch": "epoch_scan",
    }
    if disp_img_per_sec is not None:
        record["per_dispatch_img_per_sec"] = round(disp_img_per_sec, 2)
    if baseline.get("img_per_sec"):
        record["vs_cpu_baseline"] = round(
            img_per_sec / baseline["img_per_sec"], 2)
    if mfu is not None:
        record["mfu"] = mfu
        record["analytic_tflop_per_step"] = round(flops / 1e12, 3)
    if fixed_img_per_sec is not None:
        record["fixed_mode_img_per_sec"] = round(fixed_img_per_sec, 2)
        record["fixed_mode_mfu"] = fixed_mfu
        record["fixed_mode_batch_size"] = fixed_bs
    elif fixed_mode_error is not None:
        record["fixed_mode_error"] = fixed_mode_error
    if transfer_img_per_sec is not None:
        record["transfer_img_per_sec"] = round(transfer_img_per_sec, 2)
        record["transfer_mfu"] = transfer_mfu
        record["transfer_batch_size"] = TRANSFER_BATCH_SIZE
    elif transfer_error is not None:
        record["transfer_error"] = transfer_error
    print(json.dumps(record))


if __name__ == "__main__":
    main()
