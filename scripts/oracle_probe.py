"""Oracle-box mask diagnosis for the dense-scene AP75 collapse (r5 #2).

The r3 quality matrix shows mask AP75 collapsing to 0.016-0.018 on the
dense split (~111 instances/tile) while AP50 holds 0.12-0.30. This
probe separates the candidate causes with GT boxes as the oracle:

  arm A (quant ceiling, model-free): paste the dataset's stored 28x28
      GT mask targets back at their own GT boxes and IoU against the
      rasterized dense GT. Upper-bounds EVERY mask head at this mask
      resolution + paste binarization (reference semantics,
      src/utils/mask_utils.py:129-171 / custom_maskrcnn.py:265-295).
  arm B (oracle-box masks): RoIAlign at GT boxes -> mask head ->
      paste at GT boxes -> IoU vs dense GT. Isolates the mask HEAD
      (arm A already bounds the representation), with boxes perfect.
  arm C (detections): the real inference path; per-GT best box IoU
      and best mask IoU. The gap between B and C is box localization
      + recall, not mask quality.

All three report IoU distributions binned by sqrt(GT box area), plus
the fraction >= 0.75 (what AP75 needs) and >= 0.5.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/oracle_probe.py \
      --ckpt outputs/sweep/lc/a12_s0/models/custom_maskrcnn_10epochs.ckpt \
      --data_dir /tmp/dense/split
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BIN_EDGES = [0, 12, 16, 20, 24, 32, 1e9]


def summarize(sizes: np.ndarray, ious: np.ndarray) -> dict:
    out = {"n": int(len(ious))}
    if len(ious):
        out.update(
            mean=round(float(ious.mean()), 4),
            p10=round(float(np.percentile(ious, 10)), 4),
            p50=round(float(np.percentile(ious, 50)), 4),
            p90=round(float(np.percentile(ious, 90)), 4),
            frac_ge_50=round(float((ious >= 0.5).mean()), 4),
            frac_ge_75=round(float((ious >= 0.75).mean()), 4))
    bins = {}
    for lo, hi in zip(BIN_EDGES[:-1], BIN_EDGES[1:]):
        sel = (sizes >= lo) & (sizes < hi)
        if sel.any():
            bins[f"{lo}-{'inf' if hi > 1e8 else hi}px"] = {
                "n": int(sel.sum()),
                "mean": round(float(ious[sel].mean()), 4),
                "frac_ge_75": round(float((ious[sel] >= 0.75).mean()), 4),
            }
    out["by_size"] = bins
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--data_dir", default="split")
    parser.add_argument("--split", default="test")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--paste_thresh", type=float, default=0.5)
    parser.add_argument("--max_images", type=int, default=0)
    parser.add_argument("--out", default=None)
    # Inference-cap overrides (as scripts/eval_ckpt.py): arm C on dense
    # scenes is cap-confounded at the reference 50-detection budget.
    parser.add_argument("--dets", type=int, default=0)
    parser.add_argument("--infer_nms", type=float, default=0.0)
    parser.add_argument("--det_nms", type=float, default=0.0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from livecell_tpu.config import (Config, apply_dense_flags,
                                     model_config_from_dict)
    from livecell_tpu.data.coco import CocoIndex, ann_to_mask
    from livecell_tpu.data.dataset import get_datasets
    from livecell_tpu.models.mask_rcnn import create_model
    from livecell_tpu.ops.mask_ops import paste_masks
    from livecell_tpu.parallel.train_step import make_eval_step
    from livecell_tpu.train import checkpoint
    from livecell_tpu.train.coco_eval import mask_iou_matrix
    from livecell_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    ckpt = checkpoint.load(args.ckpt)
    if ckpt.get("model_config"):
        mcfg = model_config_from_dict(ckpt["model_config"])
    else:
        mcfg = dataclasses.replace(Config().model, heads_all_images=True,
                                   decode_proposals=True)
    mcfg = apply_dense_flags(mcfg, args.dets, args.infer_nms, args.det_nms)

    datasets = get_datasets(args.data_dir, mcfg)
    ds = datasets[args.split]
    observed = int(ds.instance_counts().max()) if len(ds) else 0
    auto_i = min(max(32, -(-observed // 32) * 32), 512)
    if auto_i != mcfg.max_instances:
        mcfg = dataclasses.replace(mcfg, max_instances=auto_i)
        ds.cfg = mcfg

    model, variables = create_model(mcfg, jax.random.key(0))
    params, batch_stats = ckpt["params"], ckpt["batch_stats"]
    ms = mcfg.mask_size
    th = min(ds.tile_hw[0], mcfg.image_height)
    tw = min(ds.tile_hw[1], mcfg.image_width)
    coco = CocoIndex(ds.ann_file)

    def _oracle(mdl, images, boxes):
        feats = mdl.extract_features(images, train=False)
        rois = mdl._roi_align(feats[0], boxes)
        mlogits = mdl.mask_head(rois.reshape((-1,) + rois.shape[2:]))
        b, k = boxes.shape[:2]
        return jax.nn.sigmoid(mlogits[..., 1].reshape(b, k, ms, ms))

    @jax.jit
    def oracle_probs(images, boxes):
        imgs = images.astype(jnp.float32) / 255.0
        return model.apply({"params": params, "batch_stats": batch_stats},
                           imgs, boxes, method=_oracle)

    @jax.jit
    def paste_fn(probs, boxes, valid):
        full = paste_masks(probs, boxes,
                           (mcfg.image_height, mcfg.image_width),
                           threshold=args.paste_thresh, valid=valid)
        return full[:, :th, :tw] > 0

    import functools

    @functools.partial(jax.jit, static_argnames=("n_gt",))
    def iou_fn(dmasks, gmasks, n_gt):
        return mask_iou_matrix(dmasks, gmasks)

    eval_step = make_eval_step(model)

    arms = {k: {"sizes": [], "ious": []}
            for k in ("quant_ceiling", "oracle_mask", "det_box", "det_mask")}
    idx_cursor = 0
    n_done = 0
    for images, targets, bvalid in ds.batches(args.batch_size):
        jb = jnp.asarray(targets["boxes"])
        jv = jnp.asarray(targets["valid"])
        probs_b = np.asarray(oracle_probs(jnp.asarray(images), jb))
        quant_b = np.asarray(targets["mask28"], np.float32) / 255.0
        det = jax.tree.map(np.asarray,
                           eval_step(params, batch_stats,
                                     jnp.asarray(images)))
        for bi in range(images.shape[0]):
            if not bvalid[bi]:
                continue
            tile_idx = idx_cursor
            idx_cursor += 1
            lo, hi = ds.offsets[tile_idx], ds.offsets[tile_idx + 1]
            n_gt = int(hi - lo)
            if n_gt == 0:
                continue
            n_done += 1
            img_id = int(ds.image_ids[tile_idx])
            gmasks = np.stack([ann_to_mask(a, th, tw)
                               for a in coco.get_anns(img_id)
                               if not a.get("iscrowd", 0)])
            g_j = jnp.asarray(gmasks)
            gb = ds.boxes[lo:hi]
            sizes = np.sqrt(np.maximum(
                (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1]), 0))

            # arms A and B: paste at GT boxes, IoU matrix vs dense GT,
            # per-GT column max (the pasted mask that covers it best).
            for arm, probs in (("quant_ceiling", quant_b[bi]),
                               ("oracle_mask", probs_b[bi])):
                dm = paste_fn(jnp.asarray(probs), jb[bi], jv[bi])
                m = np.asarray(iou_fn(dm, g_j, gmasks.shape[0]))
                per_gt = m[:n_gt].max(axis=0) if len(m) else \
                    np.zeros(gmasks.shape[0])
                arms[arm]["sizes"].append(sizes[:len(per_gt)])
                arms[arm]["ious"].append(per_gt[:len(sizes)])

            # arm C: real detections; per-GT best box IoU and mask IoU.
            valid = det.valid[bi]
            if valid.any():
                from livecell_tpu.ops.boxes import box_iou

                biou = np.asarray(box_iou(jnp.asarray(det.boxes[bi][valid]),
                                          jnp.asarray(gb)))
                dmask = paste_fn(jnp.asarray(det.mask_probs[bi]),
                                 jnp.asarray(det.boxes[bi]),
                                 jnp.asarray(det.valid[bi]))
                dmask = np.asarray(dmask)[valid]
                miou = np.asarray(iou_fn(jnp.asarray(dmask), g_j,
                                         gmasks.shape[0]))
                arms["det_box"]["sizes"].append(sizes)
                arms["det_box"]["ious"].append(biou.max(axis=0))
                arms["det_mask"]["sizes"].append(sizes[:miou.shape[1]])
                arms["det_mask"]["ious"].append(miou.max(axis=0)[:len(sizes)])
        if args.max_images and n_done >= args.max_images:
            break

    report = {"ckpt": args.ckpt, "split": args.split,
              "data_dir": args.data_dir, "images": n_done,
              "paste_thresh": args.paste_thresh,
              "mask_size": ms}
    for arm, d in arms.items():
        if d["ious"]:
            report[arm] = summarize(np.concatenate(d["sizes"]),
                                    np.concatenate(d["ious"]))
    print(json.dumps(report, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(report))


if __name__ == "__main__":
    main()
