"""Evaluate a saved custom-model checkpoint without retraining.

The reference repo has no eval-only entry point (its evaluate() only
runs inside the trainers, reference src/train_custom.py:104-170); this
adds one so inference-time settings — detection budget, NMS thresholds
(`--dets/--infer_nms/--det_nms`), score threshold — can be swept on a
trained model in seconds instead of re-running 10-epoch trainings.

Used for the r3 dense-scene study: dense tiles train one model, then
each caps/NMS arm is a 2-minute eval of the same checkpoint.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_ckpt.py \
      --ckpt models/custom_maskrcnn_10epochs.ckpt --data_dir split \
      --fixed_heads --decode_proposals --dets 256 --infer_nms 0.7 \
      --det_nms 0.5

Prints one JSON line with box metrics (IoU/P/R/F1) + COCO box/mask AP.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--data_dir", default="split")
    parser.add_argument("--split", default="test")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--fixed_heads", action="store_true",
                        help="model was trained with --fixed_heads")
    parser.add_argument("--decode_proposals", action="store_true",
                        help="model was trained with --decode_proposals")
    parser.add_argument("--frozen_bn", action="store_true")
    parser.add_argument("--dets", type=int, default=0)
    parser.add_argument("--infer_nms", type=float, default=0.0)
    parser.add_argument("--det_nms", type=float, default=0.0)
    parser.add_argument("--score_thresh", type=float, default=0.5)
    parser.add_argument("--iou_thresh", type=float, default=0.5)
    parser.add_argument("--no_coco_ap", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from livecell_tpu.config import (Config, apply_dense_flags,
                                     model_config_from_dict)
    from livecell_tpu.data.dataset import get_datasets
    from livecell_tpu.models.mask_rcnn import create_model
    from livecell_tpu.parallel.train_step import make_eval_step
    from livecell_tpu.train import checkpoint, metrics as metrics_lib
    from livecell_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    ckpt = checkpoint.load(args.ckpt)
    if ckpt.get("model_config"):
        # The exact training-time model config (anchor geometry, budgets,
        # quirk switches) travels with the checkpoint; CLI flags below
        # only override the inference-time caps being swept.
        mcfg = model_config_from_dict(ckpt["model_config"])
    else:
        mcfg = Config().model
        mcfg = dataclasses.replace(
            mcfg, heads_all_images=args.fixed_heads,
            decode_proposals=args.decode_proposals, frozen_bn=args.frozen_bn)
    mcfg = apply_dense_flags(mcfg, args.dets, args.infer_nms, args.det_nms)

    datasets = get_datasets(args.data_dir, mcfg)
    ds = datasets[args.split]
    observed = max((int(d.instance_counts().max())
                    for d in datasets.values() if len(d)), default=0)
    auto_i = min(max(32, -(-observed // 32) * 32), 512)
    if observed and auto_i != mcfg.max_instances:
        mcfg = dataclasses.replace(mcfg, max_instances=auto_i)
        for d in datasets.values():
            d.cfg = mcfg

    model, variables = create_model(mcfg, jax.random.key(0))
    params, batch_stats = ckpt["params"], ckpt["batch_stats"]
    # Structural check: the checkpoint must match the configured model.
    ref = jax.tree.map(lambda x: x.shape, variables["params"])
    got = jax.tree.map(lambda x: x.shape, params)
    if ref != got:
        raise SystemExit("checkpoint params do not match the model "
                         "config (wrong --fixed_heads/--decode_proposals?)")

    eval_step = make_eval_step(model)
    row = {"split": args.split, "dets": mcfg.max_detections,
           "infer_nms": mcfg.infer_nms_thresh,
           "det_nms": mcfg.det_nms_thresh}
    if args.no_coco_ap:
        tm = metrics_lib.evaluate(eval_step, params, batch_stats, ds,
                                  args.batch_size, args.score_thresh,
                                  args.iou_thresh)
    else:
        # ONE detector pass over the split: box P/R/F1 + COCO mask AP +
        # COCO box AP together (evaluate_coco_multi fuses all three).
        from livecell_tpu.train.coco_eval import evaluate_coco_multi

        aps = evaluate_coco_multi(eval_step, params, batch_stats, ds,
                                  args.batch_size,
                                  iou_types=("segm", "bbox"),
                                  box_metrics=True,
                                  score_thresh=args.score_thresh,
                                  iou_thresh=args.iou_thresh)
        tm = aps.pop("box_metrics")
        for iou_type, ap in aps.items():
            tag = "mask" if iou_type == "segm" else "box"
            row.update({f"{tag}_AP": round(ap["AP"], 4),
                        f"{tag}_AP50": round(ap["AP50"], 4),
                        f"{tag}_AP75": round(ap["AP75"], 4)})
    row.update({"mean_iou": round(tm["mean_iou"], 4),
                "precision": round(tm["mean_precision"], 4),
                "recall": round(tm["mean_recall"], 4),
                "f1": round(tm["f1_score"], 4)})
    print(json.dumps(row))


if __name__ == "__main__":
    main()
