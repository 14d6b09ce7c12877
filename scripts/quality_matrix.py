"""Quality matrix: {sparse, livecell-stats, dense} x {reference caps,
lifted caps} -> mask/box AP + F1.

The real LIVECell dataset is unreachable from this image, so the
closest achievable parity evidence is synthetic splits whose instance
statistics bracket the real data (README.md:324-327: 1.6M instances /
5,239 frames ~= 305/frame ~= 12/tile mean with heavy tails):

  sparse  — uniform ellipses, <=7 instances/tile (the r1/r2 standard)
  lc      — LIVECell-shaped stats (tests/util_fakedata.py
            sample_livecell_instances): lognormal sizes, 3:1 aspects,
            ~59 instances/tile mean after tiling
  dense   — cells_per_image=500 => ~111 instances/tile stress split

Each split trains ONE flagship model (--fixed_heads --decode_proposals
--mask_samples 64, 10 epochs), then scripts/eval_ckpt.py sweeps the
inference caps on the same checkpoint:

  reference caps — 50 detections, proposal NMS 0.4 (the reference's
                   structural limits, src/utils/proposal_utils.py:33-59)
  lifted caps    — --dets 256 --infer_nms 0.7 --det_nms 0.6

Writes outputs/quality_matrix.jsonl (one line per cell) and prints a
markdown table for STATUS.md.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_matrix.py \
      --splits sparse:/tmp/synth lc:/tmp/lc dense:/tmp/dense
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def sh(cmd, cwd):
    print(f"+ {' '.join(cmd)} (cwd={cwd})", flush=True)
    return subprocess.run(cmd, cwd=cwd, capture_output=True, text=True)


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
    parser = argparse.ArgumentParser()
    parser.add_argument("--splits", nargs="+",
                        default=["sparse:/tmp/synth", "lc:/tmp/lc",
                                 "dense:/tmp/dense"],
                        help="name:root pairs; root must contain split/")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--out", default=str(REPO / "outputs" /
                                             "quality_matrix.jsonl"))
    parser.add_argument("--skip_train", action="store_true",
                        help="reuse existing checkpoints")
    args = parser.parse_args()

    env = os.environ.copy()
    env.setdefault("PYTHONPATH", "/root/repo:/root/.axon_site")

    rows = []
    for pair in args.splits:
        name, root = pair.split(":", 1)
        root = Path(root)
        ckpt = root / "models" / \
            f"custom_maskrcnn_{args.epochs}epochs.ckpt"
        if not args.skip_train or not ckpt.exists():
            r = subprocess.run(
                [sys.executable, "-m", "livecell_tpu.train.train_custom",
                 "--batch_size", str(args.batch_size), "--lr", "0.001",
                 "--num_epochs", str(args.epochs), "--lr_step_size", "6",
                 "--data_dir", "split", "--fixed_heads",
                 "--decode_proposals", "--mask_samples", "64",
                 "--device_data", "on"],
                cwd=root, env=env, capture_output=True, text=True)
            if r.returncode != 0:
                print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"train failed for {name}")
            print(f"[{name}] trained", flush=True)

        for caps, extra in (
                ("reference", []),
                ("lifted", ["--dets", "256", "--infer_nms", "0.7",
                            "--det_nms", "0.6"])):
            r = subprocess.run(
                [sys.executable, str(REPO / "scripts" / "eval_ckpt.py"),
                 "--ckpt", str(ckpt), "--data_dir", "split",
                 "--fixed_heads", "--decode_proposals"] + extra,
                cwd=root, env=env, capture_output=True, text=True)
            rec = last_json_line(r.stdout)
            if rec is None:
                print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"eval failed for {name}/{caps}")
            rec.update({"split": name, "caps": caps})
            rows.append(rec)
            print(f"[{name}/{caps}] {json.dumps(rec)}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    print("\n| split | caps | mask AP | mask AP50 | mask AP75 "
          "| box AP | F1 |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['split']} | {r['caps']} "
              f"| {r.get('mask_AP', float('nan')):.3f} "
              f"| {r.get('mask_AP50', float('nan')):.3f} "
              f"| {r.get('mask_AP75', float('nan')):.3f} "
              f"| {r.get('box_AP', float('nan')):.3f} "
              f"| {r.get('f1', float('nan')):.3f} |")


if __name__ == "__main__":
    main()
