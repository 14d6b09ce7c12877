"""Train the custom Mask R-CNN — CLI-compatible with the reference
(reference src/train_custom.py:211-401).

    python -m livecell_tpu.train.train_custom \
        --batch_size 2 --lr 0.001 --num_epochs 5 [--use_wandb]

Differences by design:
  * one jitted train step (forward, losses, backward, AdamW, grad-norm)
    instead of an eager loop with a Python grad-norm pass,
  * data-parallel over all visible devices via the ('data','model') mesh
    when more than one is present,
  * AdamW + StepLR(2, 0.1) expressed as an optax schedule
    (reference train_custom.py:297-302),
  * checkpoints are Orbax pytrees with the reference's logical contents
    (epoch, params, optimizer state, loss/metric history, param_info).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, List

import numpy as np


def build_optimizer(lr: float, weight_decay: float, steps_per_epoch: int,
                    step_size: int = 2, gamma: float = 0.1):
    """AdamW with the reference's per-epoch StepLR decay."""
    import optax

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr * (gamma ** (epoch // step_size))

    return optax.adamw(schedule, weight_decay=weight_decay), schedule


def save_training_plot(train_losses: List[float], val_metrics: List[Dict],
                       save_path: str):
    """3-panel loss / IoU / F1 plot (reference train_custom.py:173-208)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    epochs = range(1, len(train_losses) + 1)
    panels = [
        (train_losses, "b-", "Train Loss", "Loss"),
        ([m["mean_iou"] for m in val_metrics], "g-", "Validation IoU", "IoU"),
        ([m["f1_score"] for m in val_metrics], "r-", "Validation F1 Score",
         "F1 Score"),
    ]
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for ax, (ys, style, title, ylabel) in zip(axes, panels):
        ax.plot(epochs, ys, style)
        ax.set_xlabel("Epoch")
        ax.set_ylabel(ylabel)
        ax.set_title(title)
        ax.grid(True)
    plt.tight_layout()
    plt.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"Training plot saved to {save_path}")


def device_memory_mb() -> float:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / (1024 ** 2)
    except Exception:
        return 0.0


def main(argv=None, config=None):
    parser = argparse.ArgumentParser(description="Train Custom Mask R-CNN")
    parser.add_argument("--model", type=str, default="custom")
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--num_epochs", type=int, default=5)
    parser.add_argument("--use_wandb", action="store_true")
    parser.add_argument("--wandb_project", type=str,
                        default="livecell-instance-segmentation")
    parser.add_argument("--data_dir", type=str, default="data_split")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval_batch_size", type=int, default=None)
    parser.add_argument("--coco_ap", action="store_true",
                        help="also compute COCO mask/box AP on the test "
                             "split (the BASELINE headline metric)")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint directory to resume from")
    parser.add_argument("--device_data", type=str, default="auto",
                        choices=["auto", "on", "off"],
                        help="keep the whole split in device memory and "
                             "gather batches on-device (auto: on for "
                             "single-device runs when the split fits)")
    parser.add_argument("--fixed_heads", action="store_true",
                        help="train box/mask heads + RPN on every image "
                             "in the batch instead of the reference's "
                             "image-0-only quirk (ModelConfig."
                             "heads_all_images)")
    parser.add_argument("--decode_proposals", action="store_true",
                        help="decode RPN/box-head deltas into real boxes "
                             "(the reference trains but never applies "
                             "them; ModelConfig.decode_proposals)")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans (fail fast at the op "
                             "producing a NaN; the sanitizer hook, "
                             "SURVEY.md §5)")
    parser.add_argument("--mask_samples", type=int, default=0,
                        help="fixed mode: run the mask head on the top-N "
                             "mask-fg proposals only (0 = all sampled "
                             "proposals, the reference behavior)")
    parser.add_argument("--roi_backend", type=str, default=None,
                        choices=["auto", "einsum", "pallas"],
                        help="RoIAlign backend (pallas = fused VMEM "
                             "kernel, TPU only; ~13%% faster step)")
    parser.add_argument("--match_backend", type=str, default=None,
                        choices=["auto", "xla", "pallas"],
                        help="anchor-GT matcher backend (pallas = fused "
                             "VMEM kernel, ops/pallas_match.py)")
    parser.add_argument("--frozen_bn", action="store_true",
                        help="backbone BN uses running statistics even "
                             "in train mode (torchvision FrozenBatchNorm"
                             "2d semantics; skips batch-stat reduction "
                             "passes — ModelConfig.frozen_bn)")
    parser.add_argument("--topk_backend", type=str, default=None,
                        choices=["auto", "exact", "approx"],
                        help="training-time top-k (approx = single-pass "
                             "ApproxTopK HLO on TPU; ops/topk.py)")
    parser.add_argument("--dets", type=int, default=0,
                        help="detection budget per tile (sets "
                             "infer_post_nms = max_detections = N and "
                             "infer_pre_topk = 5N). The reference caps "
                             "at 50 (proposal_utils.py:33-59), which "
                             "structurally bounds recall on dense tiles "
                             "(LIVECell tiles can exceed 100 cells); "
                             "0 keeps the reference caps")
    parser.add_argument("--infer_nms", type=float, default=0.0,
                        help="proposal NMS IoU (reference 0.4; dense "
                             "tiles benefit from torchvision's 0.7 — "
                             "the 0.4 default suppresses overlapping "
                             "true neighbors)")
    parser.add_argument("--det_nms", type=float, default=0.0,
                        help="final detection NMS IoU (reference 0.5)")
    parser.add_argument("--lr_step_size", type=int, default=None,
                        help="decay LR by lr_gamma every N epochs "
                             "(default: the reference's StepLR(2, 0.1))")
    parser.add_argument("--save_every", type=int, default=0,
                        help="also checkpoint every N epochs (0 = only at "
                             "the end, the reference behavior)")
    from livecell_tpu.config import add_train_shape_flags

    add_train_shape_flags(parser)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from livecell_tpu.config import Config, model_config_to_dict
    from livecell_tpu.data.dataset import get_datasets
    from livecell_tpu.models.mask_rcnn import (
        count_parameters, create_model)
    from livecell_tpu.parallel.mesh import batch_sharding, make_mesh
    from livecell_tpu.parallel.train_step import (
        create_train_state, make_eval_step, make_train_step)
    from livecell_tpu.train import checkpoint, metrics as metrics_lib
    from livecell_tpu.train.tracker import Tracker
    from livecell_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    if args.debug_nans:
        from livecell_tpu.utils.profiling import enable_nan_debug

        enable_nan_debug(True)
    cfg = config or Config()
    mcfg = cfg.model
    if args.fixed_heads or args.decode_proposals or args.mask_samples \
            or args.roi_backend or args.dets or args.match_backend \
            or args.topk_backend or args.frozen_bn:
        import dataclasses

        mcfg = dataclasses.replace(
            mcfg, heads_all_images=args.fixed_heads or mcfg.heads_all_images,
            decode_proposals=args.decode_proposals or mcfg.decode_proposals,
            mask_train_samples=args.mask_samples or mcfg.mask_train_samples,
            roi_backend=args.roi_backend or mcfg.roi_backend,
            match_backend=args.match_backend or mcfg.match_backend,
            topk_backend=args.topk_backend or mcfg.topk_backend,
            frozen_bn=args.frozen_bn or mcfg.frozen_bn)
    from livecell_tpu.config import apply_dense_flags, apply_train_shape_flags

    mcfg = apply_dense_flags(mcfg, args.dets, args.infer_nms, args.det_nms)
    mcfg = apply_train_shape_flags(mcfg, args)

    print(f"Training {args.model.upper()} Model")
    print("\nConfiguration:")
    print(f"  Devices: {jax.devices()}")
    print(f"  Batch size: {args.batch_size}")
    print(f"  Learning rate: {args.lr}")
    print(f"  Epochs: {args.num_epochs}")
    print(f"  W&B logging: {args.use_wandb}")

    tracker = Tracker(
        args.use_wandb, args.wandb_project,
        name=f"{args.model}_lr{args.lr}_bs{args.batch_size}"
             f"_ep{args.num_epochs}",
        config={
            "model_type": args.model,
            "architecture": "Custom MaskRCNN with CBAM",
            "backbone": "ResNet-18",
            "learning_rate": args.lr, "batch_size": args.batch_size,
            "epochs": args.num_epochs, "optimizer": "AdamW",
            "weight_decay": cfg.train.weight_decay, "scheduler": "StepLR",
            "dataset": "LIVECell",
        })

    print("\nLoading datasets...")
    datasets = get_datasets(args.data_dir, mcfg)
    train_ds = datasets["train"]
    val_ds = datasets.get("val")
    test_ds = datasets.get("test")

    # Size the static instance slots to the data (the reference has no
    # padding at all — it iterates true GT lists — so matching the
    # observed max is semantics-preserving). Shrinking cuts every
    # anchor-GT matching matrix and the GT transfer; growing (capped)
    # removes the silent-truncation risk on dense tiles.
    observed = max((int(ds.instance_counts().max())
                    for ds in datasets.values() if len(ds)), default=0)
    auto_i = min(max(32, -(-observed // 32) * 32), 512)
    if observed and auto_i != mcfg.max_instances:
        import dataclasses

        print(f"  Instance slots: {mcfg.max_instances} -> {auto_i} "
              f"(split max {observed} instances/tile)")
        mcfg = dataclasses.replace(mcfg, max_instances=auto_i)
        for ds in datasets.values():
            ds.cfg = mcfg

    steps_per_epoch = len(train_ds) // args.batch_size
    if steps_per_epoch == 0:
        raise ValueError("batch_size larger than the training split")

    print("\nCreating model...")
    model, variables = create_model(mcfg, jax.random.key(args.seed))
    param_info = count_parameters(variables["params"])
    print(f"  Total parameters: {param_info['total']:,}")
    print(f"  Backbone (ResNet-18): {param_info['backbone']:,}")
    print(f"  Custom: {param_info['custom']:,} "
          f"({param_info['custom_percentage']:.1f}%)")
    print(f"  Memory size: {param_info['memory_mb']:.2f} MB")
    tracker.update_config({
        "total_params": param_info["total"],
        "custom_params": param_info["custom"],
        "cbam_params": param_info["cbam"],
        "custom_percentage": param_info["custom_percentage"],
        "model_memory_mb": param_info["memory_mb"],
    })

    tx, schedule = build_optimizer(
        args.lr, cfg.train.weight_decay, steps_per_epoch,
        args.lr_step_size or cfg.train.lr_step_size, cfg.train.lr_gamma)

    mesh = None
    if jax.device_count() > 1 and args.batch_size % jax.device_count() == 0:
        mesh = make_mesh()
        print(f"  Mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    start_epoch = 1
    state = create_train_state(model, variables, tx, mesh=mesh)
    if args.resume:
        ckpt = checkpoint.load(args.resume)
        from livecell_tpu.parallel.train_step import TrainState

        meta = ckpt.get("meta", {})
        start_epoch = int(meta.get("epoch", 0)) + 1
        opt_state = ckpt.get("opt_state")
        if opt_state is not None:
            # Orbax restores the optimizer pytree as plain dicts; graft
            # the leaves back onto optax's NamedTuple structure.
            ref = tx.init(ckpt["params"])
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(ref),
                jax.tree_util.tree_leaves(opt_state))
        else:
            opt_state = tx.init(ckpt["params"])
        state = TrainState(
            step=jnp.asarray((start_epoch - 1) * steps_per_epoch,
                             jnp.int32),
            params=ckpt["params"], batch_stats=ckpt["batch_stats"],
            opt_state=opt_state)
        print(f"Resumed from {args.resume} at epoch {start_epoch}")
    train_step = make_train_step(model, tx, mesh=mesh)
    eval_step = make_eval_step(model, mesh=mesh)

    device_train = None
    use_device_data = args.device_data in ("on", "auto")
    if use_device_data:
        from livecell_tpu.data.device_data import (
            DeviceDataset, make_epoch_train_fn)

        # With a mesh the split replicates across devices and only the
        # [B] index vector is data-sharded (see device_data.py).
        device_train = DeviceDataset(train_ds, mesh=mesh)
        print(f"  HBM-resident training data: "
              f"{device_train.nbytes / 2**20:.0f} MB for "
              f"{len(device_train)} tiles"
              + (" (replicated across mesh)" if mesh is not None else ""))
        epoch_train = make_epoch_train_fn(model, tx, device_train,
                                          mesh=mesh, donate=True)

    bsh = batch_sharding(mesh) if mesh is not None else None

    def put(x):
        arr = jnp.asarray(x)
        return jax.device_put(arr, bsh) if bsh is not None else arr

    rng = jax.random.key(args.seed + 1)
    train_losses: List[float] = []
    val_history: List[Dict] = []

    from livecell_tpu.utils.prefetch import prefetch

    for epoch in range(start_epoch, args.num_epochs + 1):
        t_epoch = time.time()
        step_metrics = []   # device scalars; fetched once per epoch so
        mems = []           # the host never blocks the dispatch pipeline
        n_steps = 0
        if device_train is not None:
            from livecell_tpu.data.device_data import epoch_indices

            idx_mat = epoch_indices(len(device_train), args.batch_size,
                                    True, args.seed + epoch)
            rng, sub = jax.random.split(rng)
            # One dispatch for the whole epoch (lax.scan over steps).
            state, stacked = epoch_train(state, idx_mat, sub)
            stacked = jax.device_get(stacked)
            n_steps = idx_mat.shape[0]
            step_metrics = [{k: v[i] for k, v in stacked.items()}
                            for i in range(n_steps)]
            mems.append(device_memory_mb())
        elif mesh is not None and jax.process_count() > 1:
            # Multi-host (DCN): each process loads only its shard of
            # every global batch (SURVEY.md §2.7 "host data loading
            # sharded per-process").
            from livecell_tpu.data.multihost import ShardedLoader

            loader = ShardedLoader(train_ds, mesh, args.batch_size,
                                   shuffle=True, seed=args.seed)
            for images, targets in loader.epoch(epoch):
                rng, sub = jax.random.split(rng)
                state, m = train_step(state, images, targets, sub)
                step_metrics.append(m)
                mems.append(device_memory_mb())
                n_steps += 1
        else:
            for images, targets, _ in prefetch(train_ds.batches(
                    args.batch_size, shuffle=True, seed=args.seed + epoch,
                    drop_last=True)):
                rng, sub = jax.random.split(rng)
                state, m = train_step(
                    state, put(images),
                    {k: put(v) for k, v in targets.items()}, sub)
                step_metrics.append(m)
                mems.append(device_memory_mb())
                n_steps += 1

        step_metrics = jax.device_get(step_metrics)
        epoch_time = time.time() - t_epoch
        gnorms = [float(m.pop("grad_norm")) for m in step_metrics]
        avg = {k: float(np.mean([m[k] for m in step_metrics]))
               for k in step_metrics[0]}
        lr_now = float(schedule((epoch - 1) * steps_per_epoch))
        print(f"\nEpoch {epoch} Training ({epoch_time:.1f}s, "
              f"{n_steps * args.batch_size / epoch_time:.1f} img/s):")
        print(f"  Loss: {avg['total_loss']:.4f}")
        print(f"    RPN Cls:  {avg['loss_rpn_cls']:.4f}")
        print(f"    Box Cls:  {avg['loss_box_cls']:.4f}")
        print(f"    Box Reg:  {avg['loss_box_reg']:.4f}")
        print(f"    Mask:     {avg['loss_mask']:.4f}")
        print(f"  Gradient Norm: {np.mean(gnorms):.4f} "
              f"(min {np.min(gnorms):.4f}, max {np.max(gnorms):.4f})")
        print(f"  Learning Rate: {lr_now:.6f}")
        print(f"  Device Memory: {np.mean(mems):.1f} MB "
              f"(max {np.max(mems):.1f} MB)")

        train_losses.append(avg["total_loss"])
        tracker.log({
            "epoch": epoch,
            "train/total_loss": avg["total_loss"],
            "train/rpn_cls_loss": avg["loss_rpn_cls"],
            "train/box_cls_loss": avg["loss_box_cls"],
            "train/box_reg_loss": avg["loss_box_reg"],
            "train/mask_loss": avg["loss_mask"],
            "dynamics/gradient_norm_mean": float(np.mean(gnorms)),
            "dynamics/gradient_norm_max": float(np.max(gnorms)),
            "dynamics/learning_rate": lr_now,
            "dynamics/memory_usage_mb": float(np.mean(mems)),
            "dynamics/epoch_time_seconds": epoch_time,
        })

        if val_ds is not None:
            vm = metrics_lib.evaluate(
                eval_step, state.params, state.batch_stats, val_ds,
                args.eval_batch_size or args.batch_size,
                cfg.train.eval_score_thresh, cfg.train.eval_iou_thresh)
            val_history.append(vm)
            print(f"  Validation: IoU {vm['mean_iou']:.4f} | "
                  f"P {vm['mean_precision']:.4f} | R {vm['mean_recall']:.4f}"
                  f" | F1 {vm['f1_score']:.4f}")
            tracker.log({
                "epoch": epoch,
                "val/mean_iou": vm["mean_iou"],
                "val/precision": vm["mean_precision"],
                "val/recall": vm["mean_recall"],
                "val/f1_score": vm["f1_score"],
            })

        if args.save_every and epoch % args.save_every == 0 and \
                epoch < args.num_epochs:
            os.makedirs("models", exist_ok=True)
            checkpoint.save(
                f"models/{args.model}_maskrcnn_epoch{epoch}.ckpt",
                state.params, state.batch_stats,
                opt_state=state.opt_state, epoch=epoch,
                train_losses=train_losses, val_metrics=val_history,
                param_info=param_info,
                model_config=model_config_to_dict(mcfg))

    os.makedirs("models", exist_ok=True)
    model_path = f"models/{args.model}_maskrcnn_{args.num_epochs}epochs.ckpt"
    checkpoint.save(model_path, state.params, state.batch_stats,
                    opt_state=state.opt_state, epoch=args.num_epochs,
                    train_losses=train_losses, val_metrics=val_history,
                    param_info=param_info,
                    model_config=model_config_to_dict(mcfg))
    print(f"\nModel saved to {model_path}")

    if val_history:
        plot_path = f"outputs/{args.model}_training_plot.png"
        save_training_plot(train_losses, val_history, plot_path)
        tracker.log_image("training_plot", plot_path)

    if test_ds is not None:
        print("\nTesting...")
        tm = metrics_lib.evaluate(
            eval_step, state.params, state.batch_stats, test_ds,
            args.eval_batch_size or args.batch_size,
            cfg.train.eval_score_thresh, cfg.train.eval_iou_thresh)
        print(f"  Test: IoU {tm['mean_iou']:.4f} | "
              f"P {tm['mean_precision']:.4f} | R {tm['mean_recall']:.4f} | "
              f"F1 {tm['f1_score']:.4f}")
        tracker.log({
            "test/mean_iou": tm["mean_iou"],
            "test/precision": tm["mean_precision"],
            "test/recall": tm["mean_recall"],
            "test/f1_score": tm["f1_score"],
        })
        if args.coco_ap:
            from livecell_tpu.train.coco_eval import evaluate_coco

            ap = evaluate_coco(eval_step, state.params, state.batch_stats,
                               test_ds, args.eval_batch_size or
                               args.batch_size, iou_type="segm")
            print(f"  Mask AP: {ap['AP']:.4f} (AP50 {ap['AP50']:.4f}, "
                  f"AP75 {ap['AP75']:.4f})")
            tracker.log({f"test/mask_{k}": v for k, v in ap.items()})

    tracker.finish()
    return state


if __name__ == "__main__":
    main()
