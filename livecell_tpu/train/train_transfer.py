"""Two-stage transfer fine-tuning of the ResNet-50 FPN Mask R-CNN.

Reference equivalent: src/train_transfer.py (hardcoded config at
:346-354): Stage 1 trains only the heads with backbone+RPN frozen
(SGD lr 5e-3, momentum 0.9, wd 5e-4, 3 epochs); Stage 2 unfreezes
everything (SGD lr 1e-3, 2 epochs). Freezing is an optax.multi_transform
mask (set_to_zero for frozen subtrees) instead of requires_grad flags.

    python -m livecell_tpu.train.train_transfer \
        [--pretrained path/to/torchvision_maskrcnn.pth] \
        [--data_dir data_split]

Without --pretrained the backbone starts from random init (this
environment cannot download torchvision weights); pass a local
state_dict for the reference's pretrained=True behavior.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, List

import numpy as np

FROZEN_STAGE1 = ("backbone", "fpn", "rpn")


def stage_optimizer(lr: float, momentum: float, weight_decay: float,
                    freeze: bool, clip_norm: float = 0.0):
    """SGD(momentum, wd); stage 1 zeroes updates for backbone/FPN/RPN
    (reference freeze_backbone, train_transfer.py:40-47). Optional
    global-norm clipping (not in the reference) for from-scratch runs."""
    import optax

    parts = []
    if clip_norm > 0:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts += [optax.add_decayed_weights(weight_decay),
              optax.sgd(lr, momentum=momentum)]
    sgd = optax.chain(*parts)
    if not freeze:
        return sgd

    def label(params):
        return {k: ("frozen" if k in FROZEN_STAGE1 else "train")
                for k in params}

    return optax.multi_transform(
        {"train": sgd, "frozen": optax.set_to_zero()}, label)


def main(argv=None, transfer_cfg=None):
    parser = argparse.ArgumentParser(
        description="Two-stage Mask R-CNN transfer fine-tuning")
    parser.add_argument("--data_dir", type=str, default="data_split")
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--stage1_epochs", type=int, default=3)
    parser.add_argument("--stage2_epochs", type=int, default=2)
    parser.add_argument("--stage1_lr", type=float, default=5e-3)
    parser.add_argument("--stage2_lr", type=float, default=1e-3)
    parser.add_argument("--pretrained", type=str, default=None,
                        help="local torchvision maskrcnn .pth state_dict")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--clip_grad_norm", type=float, default=0.0,
                        help="global grad-norm clip (0 = off, the "
                             "reference behavior). Strongly recommended "
                             "when training without --pretrained")
    parser.add_argument("--track_preds", action="store_true",
                        help="per-batch eval forward counting preds>0.5 "
                             "(reference train_transfer.py:117-125)")
    parser.add_argument("--device_data", type=str, default="auto",
                        choices=["auto", "on", "off"],
                        help="keep the packed split in HBM and scan whole "
                             "epochs on-device (one dispatch per epoch)")
    parser.add_argument("--coco_ap", action="store_true",
                        help="COCO mask/box AP on the test split after "
                             "training (train/coco_eval.py)")
    parser.add_argument("--visualize_every", type=int, default=0,
                        help="save GT-vs-pred 3-panel PNGs every N epochs "
                             "(reference train_transfer.py:258-337; "
                             "0 = off)")
    parser.add_argument("--visualize_samples", type=int, default=5)
    parser.add_argument("--eval_batch_size", type=int, default=0,
                        help="batch size for eval forwards (0 = "
                             "batch_size)")
    parser.add_argument("--frozen_bn", type=str, default="auto",
                        choices=["auto", "on", "off"],
                        help="torchvision FrozenBatchNorm2d backbone "
                             "semantics. auto: on when --pretrained is "
                             "given (torchvision freezes backbone BN "
                             "unconditionally, so this is the parity "
                             "default with real weights), off for "
                             "from-scratch runs (frozen init-stats "
                             "cripple random-init training)")
    parser.add_argument("--mfu", action="store_true",
                        help="print step TFLOPs + MFU per stage "
                             "(analytic jaxpr count, utils/flops.py)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from livecell_tpu.config import Config, ModelConfig
    from livecell_tpu.data.dataset import get_datasets
    from livecell_tpu.models.transfer import (
        TransferConfig, create_transfer_model)
    from livecell_tpu.parallel.mesh import batch_sharding, make_mesh
    from livecell_tpu.parallel.train_step import (
        create_train_state, make_eval_step, make_train_step)
    from livecell_tpu.train import checkpoint, metrics as metrics_lib
    from livecell_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config()
    tcfg = transfer_cfg or TransferConfig()
    want_frozen = (args.frozen_bn == "on" or
                   (args.frozen_bn == "auto" and bool(args.pretrained)))
    if transfer_cfg is None and want_frozen != tcfg.frozen_bn:
        import dataclasses

        tcfg = dataclasses.replace(tcfg, frozen_bn=want_frozen)

    print("Two-stage transfer training (ResNet-50 FPN Mask R-CNN)")
    if args.pretrained:
        print(f"  Importing torchvision weights from {args.pretrained}")
    else:
        print("  WARNING: no --pretrained checkpoint; backbone is random "
              "init (no network access for torchvision downloads).")
        if args.clip_grad_norm == 0:
            print("  WARNING: the reference two-stage LRs assume a "
                  "pretrained backbone and DIVERGE from random init; "
                  "use --clip_grad_norm 10 --stage1_lr 1e-4 (or provide "
                  "--pretrained) for a stable from-scratch run.")

    # Dataset packing reuses the custom pipeline; instance slots sized by
    # the transfer config.
    dcfg = ModelConfig(max_instances=tcfg.max_instances,
                       mask_size=tcfg.mask_size,
                       image_height=tcfg.tile_height,
                       image_width=tcfg.tile_width)
    datasets = get_datasets(args.data_dir, dcfg)
    train_ds = datasets["train"]
    val_ds = datasets.get("val")
    test_ds = datasets.get("test")

    model, variables = create_transfer_model(
        rng=jax.random.key(args.seed), cfg=tcfg,
        pretrained_path=args.pretrained)

    mesh = None
    if jax.device_count() > 1 and args.batch_size % jax.device_count() == 0:
        mesh = make_mesh()
        print(f"  Mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    bsh = batch_sharding(mesh) if mesh is not None else None

    def put(x):
        arr = jnp.asarray(x)
        return jax.device_put(arr, bsh) if bsh is not None else arr

    use_device_data = args.device_data in ("on", "auto")
    device_train = None
    if use_device_data:
        from livecell_tpu.data.device_data import DeviceDataset

        device_train = DeviceDataset(train_ds, mesh=mesh)
        print(f"  HBM-resident training data: "
              f"{device_train.nbytes / 2**20:.0f} MB for "
              f"{len(device_train)} tiles")

    eval_step = make_eval_step(model, mesh=mesh)
    eval_bs = args.eval_batch_size or args.batch_size
    rng = jax.random.key(args.seed + 1)
    history: List[Dict] = []

    def visualize_epoch(state, stage: int, epoch: int):
        """Per-epoch GT-vs-pred panels (reference
        train_transfer.py:229-337: collect num_samples, draw 3-panel
        figures with score>0.5 predictions and best-IoU labels)."""
        from livecell_tpu.serve.visualize import prediction_panels

        ds = val_ds if val_ds is not None else train_ds
        done = 0
        for images, targets, _ in ds.batches(eval_bs, shuffle=False):
            det = eval_step(state.params, state.batch_stats, put(images))
            det = jax.device_get(det)
            for i in range(images.shape[0]):
                if done >= args.visualize_samples:
                    return
                gtv = np.asarray(targets["valid"][i])
                gtb = np.asarray(targets["boxes"][i])[gtv]
                keep = np.asarray(det.valid[i])
                stats = prediction_panels(
                    np.asarray(images[i]), gtb,
                    np.asarray(det.boxes[i])[keep],
                    np.asarray(det.scores[i])[keep],
                    f"outputs/transfer_s{stage}e{epoch}_"
                    f"sample{done + 1}.png")
                print(f"  viz sample {done + 1}: GT {stats['gt_instances']}"
                      f" pred {stats['pred_instances']} "
                      f"conf {stats['mean_confidence']:.3f} "
                      f"IoU {stats['mean_iou']:.3f}")
                done += 1
            if done >= args.visualize_samples:
                return

    def run_stage(stage: int, epochs: int, lr: float, freeze: bool,
                  state=None):
        nonlocal rng
        tx = stage_optimizer(lr, cfg.transfer.momentum,
                             cfg.transfer.weight_decay, freeze,
                             args.clip_grad_norm)
        if state is None:
            state = create_train_state(model, variables, tx, mesh=mesh)
        else:
            # New optimizer for the new stage (reference creates a fresh
            # SGD at train_transfer.py:455-460).
            from livecell_tpu.parallel.train_step import TrainState

            state = TrainState(step=state.step, params=state.params,
                               batch_stats=state.batch_stats,
                               opt_state=tx.init(state.params))
            if mesh is not None:
                from livecell_tpu.parallel.train_step import \
                    state_shardings

                state = jax.device_put(state,
                                       state_shardings(mesh, state))
        step_fn = make_train_step(model, tx, mesh=mesh)
        epoch_train = None
        if device_train is not None:
            from livecell_tpu.data.device_data import make_epoch_train_fn

            epoch_train = make_epoch_train_fn(model, tx, device_train,
                                              mesh=mesh, donate=True)

        if args.mfu:
            from livecell_tpu.parallel.train_step import make_step_fn
            from livecell_tpu.utils.flops import count_flops

            images, targets, _ = next(train_ds.batches(
                args.batch_size, shuffle=False, drop_last=True))
            flops = count_flops(
                make_step_fn(model, tx), state, jnp.asarray(images),
                {k: jnp.asarray(v) for k, v in targets.items()},
                jax.random.key(0))
            print(f"  analytic step FLOPs: {flops / 1e12:.3f} TFLOP")

        print(f"\n=== Stage {stage}: lr={lr} freeze={freeze} "
              f"({epochs} epochs) ===")
        for epoch in range(1, epochs + 1):
            t0 = time.time()
            sums: Dict[str, float] = {}
            n = 0
            pred_counts = []
            if epoch_train is not None:
                from livecell_tpu.data.device_data import epoch_indices

                idx_mat = epoch_indices(
                    len(device_train), args.batch_size, True,
                    args.seed + stage * 100 + epoch)
                rng, sub = jax.random.split(rng)
                state, stacked = epoch_train(state, idx_mat, sub)
                stacked = jax.tree.map(float, jax.tree.map(
                    lambda v: v.sum(), jax.device_get(stacked)))
                n = idx_mat.shape[0]
                sums = dict(stacked)
            else:
                for images, targets, _ in train_ds.batches(
                        args.batch_size, shuffle=True,
                        seed=args.seed + stage * 100 + epoch,
                        drop_last=True):
                    rng, sub = jax.random.split(rng)
                    state, m = step_fn(
                        state, put(images),
                        {k: put(v) for k, v in targets.items()}, sub)
                    for k, v in jax.tree.map(float, m).items():
                        sums[k] = sums.get(k, 0.0) + v
                    n += 1
                    if args.track_preds:
                        det = eval_step(state.params, state.batch_stats,
                                        put(images))
                        pred_counts.append(float(
                            (det.valid & (det.scores > 0.5)).sum(axis=1)
                            .mean()))
            # Sync on a host value fetch (block_until_ready returns
            # early through the tunnel).
            float(jax.tree.leaves(state.params)[0].sum())
            dt = time.time() - t0
            avg = {k: v / max(n, 1) for k, v in sums.items()}
            msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(avg.items()))
            print(f"Stage {stage} epoch {epoch}: {dt:.1f}s "
                  f"({n * args.batch_size / dt:.1f} img/s) {msg}")
            if pred_counts:
                print(f"  preds>0.5 per image: {np.mean(pred_counts):.2f}")

            if val_ds is not None:
                vm = metrics_lib.evaluate(
                    eval_step, state.params, state.batch_stats, val_ds,
                    eval_bs)
                history.append(vm)
                print(f"  Val: IoU {vm['mean_iou']:.4f} | "
                      f"P {vm['mean_precision']:.4f} | "
                      f"R {vm['mean_recall']:.4f} | "
                      f"F1 {vm['f1_score']:.4f}")
            if args.visualize_every and epoch % args.visualize_every == 0:
                visualize_epoch(state, stage, epoch)
        return state

    state = run_stage(1, args.stage1_epochs, args.stage1_lr, freeze=True)
    state = run_stage(2, args.stage2_epochs, args.stage2_lr, freeze=False,
                      state=state)

    os.makedirs("models", exist_ok=True)
    path = "models/maskrcnn_resnet50_two_stage.ckpt"
    # Reference saves a bare state_dict (train_transfer.py:511-513).
    checkpoint.save(path, state.params, state.batch_stats)
    print(f"\nModel saved to {path}")

    if test_ds is not None:
        tm = metrics_lib.evaluate(eval_step, state.params,
                                  state.batch_stats, test_ds, eval_bs)
        print(f"Test: IoU {tm['mean_iou']:.4f} | "
              f"P {tm['mean_precision']:.4f} | R {tm['mean_recall']:.4f} | "
              f"F1 {tm['f1_score']:.4f}")
        if args.coco_ap:
            from livecell_tpu.train.coco_eval import evaluate_coco_multi

            aps = evaluate_coco_multi(eval_step, state.params,
                                      state.batch_stats, test_ds, eval_bs,
                                      iou_types=("segm", "bbox"))
            ap, bap = aps["segm"], aps["bbox"]
            print(f"Test Mask AP: {ap['AP']:.4f} (AP50 {ap['AP50']:.4f}, "
                  f"AP75 {ap['AP75']:.4f})")
            print(f"Test Box AP:  {bap['AP']:.4f} "
                  f"(AP50 {bap['AP50']:.4f}, AP75 {bap['AP75']:.4f})")
    return state


if __name__ == "__main__":
    main()
