"""Dense-scene anchor/budget sweep (round-5 VERDICT #1/#7).

The r3 quality matrix showed the flagship recipe collapsing on
LIVECell-statistics scenes (~59 instances/tile): lc-split mask AP
0.117 (reference caps) / 0.156 (lifted).  The r4 hypothesis — the
default 32/64/128 anchors never cross the 0.5 IoU gate on ~20 px
cells (reference src/components/anchor_generator.py:8,
src/utils/proposal_utils.py:12-14) — gained CLI knobs
(--anchor_sizes/--train_topk/--train_samples/--rpn_batch/--rpn_pos)
but zero training runs.  This script runs them, multi-seed.

Each (recipe, seed) trains the flagship config in its own workdir
(checkpoints are cwd-relative), then scripts/eval_ckpt.py sweeps
inference caps on the saved checkpoint; the anchor geometry rides
the r4 model-config sidecar so eval rebuilds the exact model.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/dense_sweep.py \
      --split /tmp/lc --name lc --seeds 0 1 2
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Shared training budget for dense scenes: train-time proposal budget
# lifted from 500->1024 pre-NMS, 128->256 sampled ROIs, RPN minibatch
# 256->512 with up to 256 positives (the reference's 128/256,
# src/components/rpn.py:80-99, starves positives at ~59 GT/tile).
DENSE_BUDGET = ["--train_topk", "1024", "--train_samples", "256",
                "--rpn_batch", "512", "--rpn_pos", "256"]

RECIPES = {
    # r3 baseline geometry (reference anchors, reference budgets).
    "base": [],
    # reference anchors + dense budgets (isolates budget effect).
    "budget": DENSE_BUDGET,
    # small anchors, 3 sizes (cells ~14-28 px after lognormal sampling).
    "a12": ["--anchor_sizes", "12,24,48"] + DENSE_BUDGET,
    # smaller still.
    "a8": ["--anchor_sizes", "8,16,32"] + DENSE_BUDGET,
    # 4-size pyramid: covers 8..64 px.
    "a4x": ["--anchor_sizes", "8,16,32,64"] + DENSE_BUDGET,
}

CAPS = {
    "reference": [],
    "lifted": ["--dets", "256", "--infer_nms", "0.7", "--det_nms", "0.6"],
}


def last_json_line(text: str):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--split", required=True,
                   help="root containing split/ (make_synth_splits.py)")
    p.add_argument("--name", default="lc")
    p.add_argument("--recipes", nargs="+", default=list(RECIPES))
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--workroot", default=str(REPO / "outputs" / "sweep"))
    p.add_argument("--out", default=None)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--eval_dets", type=int, default=256,
                   help="lifted-caps detection budget")
    args = p.parse_args()

    split_dir = Path(args.split) / "split"
    assert (split_dir / "train").exists(), f"no split at {split_dir}"
    out_path = args.out or str(
        REPO / "outputs" / f"dense_sweep_{args.name}.jsonl")

    env = os.environ.copy()
    env.setdefault("PYTHONPATH", "/root/repo:/root/.axon_site")

    caps = dict(CAPS)
    caps["lifted"] = ["--dets", str(args.eval_dets),
                      "--infer_nms", "0.7", "--det_nms", "0.6"]

    rows = []
    for recipe in args.recipes:
        extra = RECIPES[recipe]
        for seed in args.seeds:
            wd = Path(args.workroot) / args.name / f"{recipe}_s{seed}"
            wd.mkdir(parents=True, exist_ok=True)
            ckpt = wd / "models" / \
                f"custom_maskrcnn_{args.epochs}epochs.ckpt"
            if not args.skip_train or not ckpt.exists():
                t0 = time.time()
                cmd = [sys.executable, "-m",
                       "livecell_tpu.train.train_custom",
                       "--batch_size", str(args.batch_size),
                       "--lr", "0.001", "--num_epochs", str(args.epochs),
                       "--lr_step_size", "6", "--seed", str(seed),
                       "--data_dir", str(split_dir),
                       "--fixed_heads", "--decode_proposals",
                       "--mask_samples", "64", "--device_data", "on",
                       ] + extra
                r = subprocess.run(cmd, cwd=wd, env=env,
                                   capture_output=True, text=True)
                if r.returncode != 0:
                    print(r.stdout[-3000:], r.stderr[-3000:],
                          file=sys.stderr)
                    raise SystemExit(f"train failed: {recipe} s{seed}")
                print(f"[{recipe} s{seed}] trained in "
                      f"{time.time() - t0:.0f}s", flush=True)

            for cap_name, cap_extra in caps.items():
                r = subprocess.run(
                    [sys.executable, str(REPO / "scripts" / "eval_ckpt.py"),
                     "--ckpt", str(ckpt), "--data_dir", str(split_dir),
                     "--fixed_heads", "--decode_proposals"] + cap_extra,
                    cwd=wd, env=env, capture_output=True, text=True)
                rec = last_json_line(r.stdout)
                if rec is None:
                    print(r.stdout[-3000:], r.stderr[-3000:],
                          file=sys.stderr)
                    raise SystemExit(
                        f"eval failed: {recipe} s{seed} {cap_name}")
                rec.update({"recipe": recipe, "seed": seed,
                            "caps": cap_name, "split": args.name})
                rows.append(rec)
                print(f"[{recipe} s{seed}/{cap_name}] "
                      f"maskAP {rec.get('mask_AP', float('nan')):.3f} "
                      f"AP50 {rec.get('mask_AP50', float('nan')):.3f} "
                      f"AP75 {rec.get('mask_AP75', float('nan')):.3f} "
                      f"F1 {rec.get('f1', float('nan')):.3f}", flush=True)
                with open(out_path, "w") as f:
                    for row in rows:
                        f.write(json.dumps(row) + "\n")

    # mean +/- spread per (recipe, caps)
    print(f"\n### {args.name} sweep ({len(args.seeds)} seeds)")
    print("| recipe | caps | mask AP | AP50 | AP75 | box AP | F1 |")
    print("|---|---|---|---|---|---|---|")
    for recipe in args.recipes:
        for cap_name in caps:
            sel = [r for r in rows
                   if r["recipe"] == recipe and r["caps"] == cap_name]
            if not sel:
                continue

            def ms(key):
                vs = [r.get(key, float("nan")) for r in sel]
                m = statistics.fmean(vs)
                s = (max(vs) - min(vs)) / 2 if len(vs) > 1 else 0.0
                return f"{m:.3f}±{s:.3f}"

            print(f"| {recipe} | {cap_name} | {ms('mask_AP')} "
                  f"| {ms('mask_AP50')} | {ms('mask_AP75')} "
                  f"| {ms('box_AP')} | {ms('f1')} |")


if __name__ == "__main__":
    main()
