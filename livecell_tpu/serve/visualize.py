"""GT-vs-prediction full-frame visualization CLI.

Reference-compatible CLI (reference src/visualize.py:462-575):

    python -m livecell_tpu.serve.visualize \
        --model1_path models/custom_maskrcnn_5epochs.ckpt \
        --model1_type custom --test_dir data_split/test/images

Per base frame: one batched 25-tile forward + fused dedup (serve/stitch),
frame reconstruction, colored instance mask overlays for predictions and
ground truth (RLE or polygon), and a side-by-side PNG per frame.
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from livecell_tpu.config import Config, add_dense_flags, apply_dense_flags
from livecell_tpu.serve.pipeline import run_pipelined
from livecell_tpu.serve.stitch import (
    StitchedDetections, group_tiles_by_image, load_tiles,
    make_frame_predictor, reconstruct_full_image)


def load_model(model_path: str, model_type: str = "custom",
               num_classes: int = 2, mcfg=None):
    """Load a trained model + variables (reference visualize.py:27-69).

    The checkpoint's stored model config (anchor geometry, budgets,
    quirk switches — written by the trainers) is the base; fields the
    caller's `mcfg` explicitly changed from the defaults (e.g. lifted
    detection caps from apply_dense_flags) overlay it.
    """
    import dataclasses

    import jax

    from livecell_tpu.config import model_config_from_dict
    from livecell_tpu.train import checkpoint

    print(f"Loading {model_type} model from {model_path}...")
    ckpt = checkpoint.load(model_path)
    base = Config().model
    stored = ckpt.get("model_config")
    use = model_config_from_dict(stored) if stored else base
    if mcfg is not None:
        # Overlay only the caller's explicit (non-default) changes so a
        # dense-caps sweep still respects the checkpoint's training-time
        # anchor geometry and head configuration.
        diff = {f.name: getattr(mcfg, f.name)
                for f in dataclasses.fields(mcfg)
                if getattr(mcfg, f.name) != getattr(base, f.name)}
        use = dataclasses.replace(use, **diff) if diff else use
    cfg = Config().replace(model=use)
    if model_type == "custom":
        from livecell_tpu.models.mask_rcnn import create_model

        model, variables = create_model(cfg.model, jax.random.key(0))
    elif model_type == "transfer":
        from livecell_tpu.models.transfer import create_transfer_model

        model, variables = create_transfer_model(cfg.model,
                                                 jax.random.key(0))
    else:
        raise ValueError(f"Unknown model_type: {model_type}")

    variables = {"params": ckpt["params"],
                 "batch_stats": ckpt.get("batch_stats", {})}
    return model, variables


def load_coco_annotations(json_path: str):
    """filename -> annotations map (reference visualize.py:260-270)."""
    with open(json_path) as f:
        data = json.load(f)
    images = {img["id"]: img["file_name"] for img in data["images"]}
    by_image = defaultdict(list)
    for ann in data["annotations"]:
        if ann["image_id"] in images:
            by_image[images[ann["image_id"]]].append(ann)
    return dict(by_image), images


def create_mask_overlay(dets: StitchedDetections, frame_hw) -> np.ndarray:
    """RGBA overlay of predicted instance masks, tab20-colored
    (reference visualize.py:312-347)."""
    from livecell_tpu.serve.render import instance_overlay

    return instance_overlay(list(dets.masks), dets.offsets, frame_hw)


def decode_gt_masks(annotations: List[Dict], frame_hw) -> List[np.ndarray]:
    """Full-frame boolean masks from RLE or polygon segmentations."""
    from livecell_tpu.data.coco import polygons_to_mask, rle_decode

    h, w = frame_hw
    masks = []
    for ann in annotations:
        seg = ann.get("segmentation")
        if isinstance(seg, dict):
            masks.append(rle_decode(seg, (h, w)) > 0)
        elif isinstance(seg, list):
            masks.append(polygons_to_mask(seg, h, w) > 0)
    return masks


def create_gt_mask_overlay(annotations: List[Dict], frame_hw):
    """RGBA overlay of GT masks from RLE or polygons
    (reference visualize.py:350-382)."""
    from livecell_tpu.serve.render import instance_overlay

    masks = decode_gt_masks(annotations, frame_hw)
    return instance_overlay(masks, None, frame_hw), len(masks)


def prediction_panels(image: np.ndarray, gt_boxes: np.ndarray,
                      pred_boxes: np.ndarray, pred_scores: np.ndarray,
                      path: str, score_thresh: float = 0.5) -> Dict:
    """3-panel training-progress figure: original / GT boxes (green) /
    predictions over `score_thresh` (red, score + best-IoU labels).

    Functional port of the reference's per-epoch prediction visualizer
    (reference train_transfer.py:258-337). `image` is HxWx3 float [0,1]
    or uint8; boxes are xyxy. Returns the summary stats the reference
    prints (instance counts, mean confidence/IoU)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import patches

    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    img = np.clip(img, 0, 1)

    keep = pred_scores > score_thresh
    pb, ps = pred_boxes[keep], pred_scores[keep]
    if len(gt_boxes) and len(pb):
        from livecell_tpu.ops.boxes import box_iou

        ious = np.asarray(box_iou(pb, gt_boxes)).max(axis=1)
    else:
        ious = np.zeros(len(pb), np.float32)

    fig, axes = plt.subplots(1, 3, figsize=(18, 6))
    axes[0].imshow(img)
    axes[0].set_title("Original Image")
    axes[1].imshow(img)
    axes[1].set_title(f"Ground Truth ({len(gt_boxes)} instances)")
    for box in gt_boxes:
        x1, y1, x2, y2 = box
        axes[1].add_patch(patches.Rectangle(
            (x1, y1), x2 - x1, y2 - y1, linewidth=2,
            edgecolor="green", facecolor="none"))
    axes[2].imshow(img)
    axes[2].set_title(f"Predictions ({len(pb)} instances, "
                      f"score > {score_thresh})")
    for box, score, iou in zip(pb, ps, ious):
        x1, y1, x2, y2 = box
        axes[2].add_patch(patches.Rectangle(
            (x1, y1), x2 - x1, y2 - y1, linewidth=2,
            edgecolor="red", facecolor="none"))
        axes[2].text(x1, y1 - 5, f"{score:.2f} (IoU:{iou:.2f})",
                     color="red", fontsize=8, weight="bold",
                     bbox=dict(facecolor="white", alpha=0.7,
                               edgecolor="none"))
    for ax in axes:
        ax.axis("off")
    plt.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return {"gt_instances": int(len(gt_boxes)),
            "pred_instances": int(len(pb)),
            "mean_confidence": float(ps.mean()) if len(ps) else 0.0,
            "mean_iou": float(ious.mean()) if len(ious) else 0.0}


def visualize_with_ground_truth(base_name: str,
                                original_img: Optional[np.ndarray],
                                annotations: List[Dict],
                                results_list: List[StitchedDetections],
                                tiles_list: List[np.ndarray],
                                model_names: List[str],
                                save_dir: str = "outputs",
                                score_threshold: float = 0.5,
                                mask_threshold: float = 0.4,
                                tile_cfg=None,
                                renderer: str = "fast"):
    """Side-by-side GT / per-model prediction panel
    (reference visualize.py:385-459).

    renderer="fast" (default) composites with numpy + PIL at native
    frame resolution (serve/render.py; 4.77 s -> ~0.1 s per frame);
    renderer="mpl" keeps the reference-style matplotlib figure.
    """
    from livecell_tpu.config import TileConfig

    tile_cfg = tile_cfg or TileConfig()
    frame_hw = (tile_cfg.frame_height, tile_cfg.frame_width)
    os.makedirs(save_dir, exist_ok=True)
    num_plots = 1 + len(results_list)
    full_canvas = reconstruct_full_image(tiles_list[0], tile_cfg)

    if renderer == "fast":
        from livecell_tpu.serve.render import composite, render_panels

        panels = []
        if original_img is not None:
            base = np.asarray(original_img)
            if base.shape[:2] != frame_hw:
                from PIL import Image

                base = np.asarray(Image.fromarray(base).resize(
                    (frame_hw[1], frame_hw[0])))
            gt_overlay, gt_count = create_gt_mask_overlay(
                annotations, frame_hw)
            panels.append((composite(base, gt_overlay),
                           f"Ground Truth: {base_name} | "
                           f"Instances: {gt_count}", []))
        else:
            blank = np.full((*frame_hw, 3), 235, np.uint8)
            panels.append((blank, f"Ground Truth: {base_name} "
                           "(GT Not Available)", []))
        canvas_u8 = (np.clip(full_canvas, 0, 1) * 255).astype(np.uint8)
        for dets, name in zip(results_list, model_names):
            overlay = create_mask_overlay(dets, frame_hw)
            labels = []
            for k in range(len(dets.scores)):
                mask = dets.masks[k]
                if mask.any():
                    ys, xs = np.nonzero(mask)
                    labels.append((float(xs.mean() + dets.offsets[k, 0]),
                                   float(ys.mean() + dets.offsets[k, 1]),
                                   f"{dets.scores[k]:.2f}"))
            panels.append((composite(canvas_u8, overlay),
                           f"{name}: {base_name} | "
                           f"Instances: {len(dets.scores)}", labels))
        save_path = os.path.join(save_dir,
                                 f"{base_name}_GT_VS_PREDICTIONS.png")
        render_panels(
            panels, f"Ground Truth vs Predictions | "
            f"Score>{score_threshold} | "
            f"Mask>{mask_threshold * 100:.0f}%", save_path)
        print(f"Saved GT vs Predictions: {save_path}")
        return save_path

    # Build the figure without pyplot: Figure + Agg canvas have no
    # global registry, so overlay construction is safe on
    # serve/pipeline.py's thread pool.
    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure

    fig = Figure(figsize=(10 * num_plots, 10))
    FigureCanvasAgg(fig)
    axes = np.atleast_1d(fig.subplots(1, num_plots))

    if original_img is not None:
        axes[0].imshow(original_img)
        gt_overlay, gt_count = create_gt_mask_overlay(annotations, frame_hw)
        axes[0].imshow(gt_overlay)
        axes[0].set_title(f"Ground Truth: {base_name}\n"
                          f"Instances: {gt_count}", fontsize=12)
    else:
        axes[0].text(0.5, 0.5, "GT Not Available", ha="center", va="center")
        axes[0].set_title(f"Ground Truth: {base_name}", fontsize=12)
    axes[0].axis("off")

    for i, (dets, name) in enumerate(zip(results_list, model_names)):
        ax = axes[i + 1]
        ax.imshow(full_canvas)
        ax.imshow(create_mask_overlay(dets, frame_hw))
        for k in range(len(dets.scores)):
            mask = dets.masks[k]
            if mask.any():
                ys, xs = np.nonzero(mask)
                ax.text(xs.mean() + dets.offsets[k, 0],
                        ys.mean() + dets.offsets[k, 1],
                        f"{dets.scores[k]:.2f}", color="white", fontsize=6,
                        weight="bold", ha="center", va="center",
                        bbox=dict(facecolor="black", alpha=0.7,
                                  edgecolor="none", pad=1))
        ax.set_title(f"{name}: {base_name}\nInstances: {len(dets.scores)}",
                     fontsize=12)
        ax.axis("off")

    # Object-oriented (fig.*) calls only: pyplot's current-figure global
    # is racy when overlays build on serve/pipeline.py's thread pool.
    fig.suptitle(f"Ground Truth vs Predictions | Score>{score_threshold} | "
                 f"Mask>{mask_threshold * 100:.0f}%", fontsize=14, y=0.98)
    fig.tight_layout()
    save_path = os.path.join(save_dir, f"{base_name}_GT_VS_PREDICTIONS.png")
    fig.savefig(save_path, dpi=200, bbox_inches="tight")
    print(f"Saved GT vs Predictions: {save_path}")
    return save_path


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Mask R-CNN dual model inference with tiled images")
    parser.add_argument("--model1_path", type=str,
                        default="models/custom_maskrcnn_5epochs.ckpt")
    parser.add_argument("--model1_type", type=str, default="custom",
                        choices=["custom", "transfer"])
    parser.add_argument("--model1_name", type=str, default="Custom Model")
    parser.add_argument("--model2_path", type=str, default=None)
    parser.add_argument("--model2_type", type=str, default="transfer",
                        choices=["custom", "transfer"])
    parser.add_argument("--model2_name", type=str,
                        default="Transfer Learning Model")
    parser.add_argument("--test_dir", type=str,
                        default="data_split/test/images")
    parser.add_argument("--data_dir", type=str, default="data",
                        help="Raw (untiled) LIVECell tree for GT frames")
    parser.add_argument("--output_dir", type=str, default="outputs")
    parser.add_argument("--score_threshold", type=float, default=0.5)
    parser.add_argument("--mask_threshold", type=float, default=0.4)
    parser.add_argument("--renderer", type=str, default="fast",
                        choices=["fast", "mpl"],
                        help="fast: numpy+PIL native-resolution panels; "
                        "mpl: reference-style matplotlib figure")
    add_dense_flags(parser)
    args = parser.parse_args(argv)

    from PIL import Image

    cfg = Config()
    mcfg = apply_dense_flags(cfg.model, args.dets, args.infer_nms,
                             args.det_nms)
    cfg = cfg.replace(model=mcfg)
    tile_cfg = cfg.tile

    # Index raw-frame annotations across all splits
    # (reference visualize.py:505-523).
    ann_by_image: Dict[str, List] = {}
    filename_to_dir: Dict[str, str] = {}
    for split in ("test", "train", "val"):
        ann_path = os.path.join(args.data_dir, "annotations",
                                f"livecell_coco_{split}.json")
        img_dir = os.path.join(args.data_dir, split, "images")
        if os.path.exists(ann_path):
            anns, imgs = load_coco_annotations(ann_path)
            ann_by_image.update(anns)
            for fname in imgs.values():
                filename_to_dir[fname] = img_dir

    tiles_by_image = group_tiles_by_image(args.test_dir)
    print(f"Processing {len(tiles_by_image)} image sets from "
          f"{args.test_dir}")

    predictors = []
    names = []
    for path, mtype, name in [
            (args.model1_path, args.model1_type, args.model1_name),
            (args.model2_path, args.model2_type, args.model2_name)]:
        if path:
            model, variables = load_model(path, mtype, mcfg=mcfg)
            predictors.append(make_frame_predictor(
                model, variables, tile_cfg, args.score_threshold,
                args.mask_threshold))
            names.append(name)

    # Pipelined frame loop (vs reference's fully-serial per-frame
    # decode -> 25 forwards -> figure, src/visualize.py:526-563):
    # frame N+1's PNG decode and frame N-1's matplotlib figure overlap
    # frame N's device dispatch (serve/pipeline.py).
    def decode_frame(item):
        base_name, tiles_info = item
        tiles = load_tiles(tiles_info, tile_cfg)
        original_img = None
        annotations = []
        for fname, d in filename_to_dir.items():
            if os.path.splitext(fname)[0] == base_name or fname == base_name:
                p = os.path.join(d, fname)
                if os.path.exists(p):
                    with Image.open(p) as im:
                        original_img = np.asarray(im.convert("RGB"))
                    annotations = ann_by_image.get(fname, [])
                break
        return tiles, original_img, annotations

    def predict_frame(decoded):
        tiles, _, _ = decoded
        return [predict.dispatch(tiles) for predict in predictors]

    def fetch_frame(handles):
        return [predict.fetch(h)
                for predict, h in zip(predictors, handles)]

    def consume_frame(item, decoded, results):
        base_name, _ = item
        tiles, original_img, annotations = decoded
        visualize_with_ground_truth(
            base_name, original_img, annotations, results,
            [tiles] * len(results), names, save_dir=args.output_dir,
            score_threshold=args.score_threshold,
            mask_threshold=args.mask_threshold, tile_cfg=tile_cfg,
            renderer=args.renderer)

    stats = run_pipelined(list(tiles_by_image.items()), decode_frame,
                          predict_frame, consume_frame,
                          fetch_fn=fetch_frame)
    for item, err in stats.errors:
        print(f"ERROR on {item[0]}: {err!r}")
    print(f"\nFinished {stats.frames} frames "
          f"({json.dumps(stats.as_dict())}).\n"
          f"Visualizations saved to {args.output_dir}")


if __name__ == "__main__":
    main()
