"""Pipeline interpretability dashboards.

Reference equivalent: src/explain_predictions.py (forward hooks on
layer1-4 / cbam1-4 / fpn / rpn / heads, feature-map visualizations,
activation-magnitude "importance" percentages, top-RPN-proposal drawing,
and a TP/FP/FN metrics panel; 3x4 matplotlib dashboard per image).

Hooks do not exist in functional JAX; instead the model is applied with
flax's capture_intermediates, which records every submodule output in
one pass — the idiomatic equivalent (and it works under jit).

    python -m livecell_tpu.serve.explain --model_path <ckpt> \
        --data_dir data_split
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np


# All 12 reference hook points (explain_predictions.py:27-51): layer1-4,
# cbam1-4, fpn, rpn, box_head, mask_head.
STAGE_KEYS = [
    ("layer1", ("backbone", "layer1_1", "__call__")),
    ("layer2", ("backbone", "layer2_1", "__call__")),
    ("layer3", ("backbone", "layer3_1", "__call__")),
    ("layer4", ("backbone", "layer4_1", "__call__")),
    ("cbam1", ("cbam1", "__call__")),
    ("cbam2", ("cbam2", "__call__")),
    ("cbam3", ("cbam3", "__call__")),
    ("cbam4", ("cbam4", "__call__")),
    ("fpn", ("fpn", "__call__")),
    ("rpn", ("rpn", "__call__")),
    ("box_head", ("box_head", "__call__")),
    ("mask_head", ("mask_head", "__call__")),
]


def _fetch(tree: Dict, path):
    node = tree
    for k in path:
        if k not in node:
            return None
        node = node[k]
    # Captured values arrive as (output,) tuples; module outputs may
    # themselves be (nested) tuples of per-level arrays — take the first
    # leaf (level 0).
    while isinstance(node, (tuple, list)):
        if not node:
            return None
        node = node[0]
    return np.asarray(node)


def feature_map_image(act: np.ndarray) -> np.ndarray:
    """Channel-mean -> minmax-normalize (reference
    explain_predictions.py:58-72, colormapped at plot time)."""
    if act.ndim == 4:
        act = act[0]
    fm = act.astype(np.float32).mean(axis=-1)
    lo, hi = fm.min(), fm.max()
    return (fm - lo) / (hi - lo + 1e-8)


def importance_percentages(acts: Dict[str, np.ndarray]) -> Dict[str, float]:
    """Mean |activation| per stage, normalized to percentages
    (reference explain_predictions.py:74-83, 139-140)."""
    raw = {k: float(np.abs(v).mean()) for k, v in acts.items()
           if v is not None}
    total = sum(raw.values()) or 1.0
    return {k: 100.0 * v / total for k, v in raw.items()}


def capture_activations(model, variables, image_f32):
    """One inference pass recording all submodule outputs."""
    import jax

    @jax.jit
    def run(img):
        det, state = model.apply(
            variables, img[None], train=False,
            capture_intermediates=True, mutable=["intermediates"])
        return det, state["intermediates"]

    det, inter = run(image_f32)
    return jax.tree.map(np.asarray, det), inter


def top_rpn_proposals(inter: Dict, model_cfg, k: int = 50) -> np.ndarray:
    """Top-k anchor boxes by hooked RPN objectness (reference
    explain_predictions.py:228-261)."""
    from livecell_tpu.ops.anchors import generate_anchors

    rpn_out = _fetch(inter, ("rpn", "__call__"))
    if rpn_out is None:
        return np.zeros((0, 4), np.float32)
    obj = np.asarray(rpn_out).reshape(-1)
    anchors = generate_anchors(
        (model_cfg.feature_height, model_cfg.feature_width),
        model_cfg.anchor_stride, model_cfg.anchor_sizes,
        model_cfg.anchor_ratios)
    idx = np.argsort(-obj)[:k]
    return anchors[idx]


def explain_image(model, variables, image_u8: np.ndarray,
                  gt_boxes: np.ndarray, save_path: str,
                  score_threshold: float = 0.5):
    """Build one 3x4 dashboard PNG (reference
    explain_predictions.py:161-393)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.patches as patches

    mcfg = model.cfg
    h, w = image_u8.shape[:2]
    canvas = np.zeros((mcfg.image_height, mcfg.image_width, 3), np.float32)
    canvas[:h, :w] = image_u8[:mcfg.image_height, :mcfg.image_width] / 255.0

    det, inter = capture_activations(model, variables, canvas)
    inter = inter.get("intermediates", inter)

    acts = {name: _fetch(inter, path) for name, path in STAGE_KEYS}
    imp = importance_percentages(acts)
    proposals = top_rpn_proposals(inter, mcfg)

    boxes = det.boxes[0]
    scores = det.scores[0]
    keep = det.valid[0] & (scores > score_threshold)

    # TP/FP/FN at IoU 0.5 against GT.
    from livecell_tpu.ops.boxes import box_iou
    import jax.numpy as jnp

    tp = fp = fn = 0
    if len(gt_boxes) and keep.any():
        iou = np.asarray(box_iou(jnp.asarray(boxes[keep]),
                                 jnp.asarray(gt_boxes)))
        tp = int((iou.max(axis=1) > 0.5).sum())
        fp = int(keep.sum()) - tp
        fn = max(len(gt_boxes) - tp, 0)
    elif len(gt_boxes):
        fn = len(gt_boxes)

    fig, axes = plt.subplots(3, 4, figsize=(22, 14))
    axes = axes.ravel()

    axes[0].imshow(image_u8)
    axes[0].set_title("Input")

    panel = 1
    for name in ("layer1", "layer2", "layer4", "cbam1", "cbam4", "fpn"):
        if acts.get(name) is not None:
            axes[panel].imshow(feature_map_image(acts[name]), cmap="jet")
        axes[panel].set_title(name)
        panel += 1

    ax = axes[panel]
    ax.imshow(image_u8)
    for b in proposals:
        ax.add_patch(patches.Rectangle((b[0], b[1]), b[2] - b[0],
                                       b[3] - b[1], fill=False,
                                       edgecolor="yellow", linewidth=0.5))
    ax.set_title(f"Top-{len(proposals)} RPN proposals")
    panel += 1

    ax = axes[panel]
    ax.imshow(image_u8)
    for b, s in zip(boxes[keep], scores[keep]):
        ax.add_patch(patches.Rectangle((b[0], b[1]), b[2] - b[0],
                                       b[3] - b[1], fill=False,
                                       edgecolor="lime", linewidth=1.0))
    ax.set_title(f"Final detections ({int(keep.sum())})")
    panel += 1

    ax = axes[panel]
    mask_probs = det.mask_probs[0][keep]
    overlay = np.zeros((mcfg.image_height, mcfg.image_width), np.float32)
    if keep.any():
        from livecell_tpu.ops.mask_ops import paste_masks

        full = np.asarray(paste_masks(
            jnp.asarray(det.mask_probs[0]), jnp.asarray(boxes),
            (mcfg.image_height, mcfg.image_width),
            valid=jnp.asarray(keep)))
        overlay = (full > 0).sum(axis=0).astype(np.float32)
    ax.imshow(image_u8)
    shown = np.ma.masked_where(overlay[:h, :w] == 0, overlay[:h, :w])
    ax.imshow(shown, alpha=0.5, cmap="spring")
    ax.set_title("Mask overlay")
    panel += 1

    ax = axes[panel]
    names = list(imp.keys())
    ax.barh(names, [imp[n] for n in names], color="steelblue")
    ax.set_title("Stage importance (% of mean |activation|)")
    panel += 1

    ax = axes[panel]
    ax.axis("off")
    ax.text(0.05, 0.6, f"TP: {tp}\nFP: {fp}\nFN: {fn}\n"
            f"GT instances: {len(gt_boxes)}", fontsize=16)
    ax.set_title("Metrics @ IoU 0.5")

    for a in axes:
        if not a.get_title().startswith("Stage importance"):
            a.axis("off")
    plt.tight_layout()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    plt.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"Saved explanation dashboard: {save_path}")
    return save_path


def main(argv=None):
    parser = argparse.ArgumentParser(description="Pipeline explainability")
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--model_type", type=str, default="custom")
    parser.add_argument("--data_dir", type=str, default="data_split")
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--output_dir", type=str, default="outputs/explain")
    args = parser.parse_args(argv)

    from livecell_tpu.config import Config
    from livecell_tpu.data.dataset import PackedDataset
    from livecell_tpu.serve.visualize import load_model

    cfg = Config()
    model, variables = load_model(args.model_path, args.model_type)
    ds = PackedDataset(args.data_dir, args.split, cfg.model)

    # First / middle / last images (reference explain_predictions.py:433).
    for idx in sorted({0, len(ds) // 2, len(ds) - 1}):
        img = ds.images[idx]
        lo, hi = ds.offsets[idx], ds.offsets[idx + 1]
        gt = ds.boxes[lo:hi]
        explain_image(model, variables, img, gt,
                      os.path.join(args.output_dir,
                                   f"explain_{idx:04d}.png"))


if __name__ == "__main__":
    main()
