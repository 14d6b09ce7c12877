"""Generate the three standard synthetic quality-matrix trees.

Codifies the split recipe the quality numbers in STATUS.md are measured
on (scripts/quality_matrix.py consumes these roots):

  sparse — uniform ellipses, 12/frame (<=7 instances/tile), the
           r1/r2 "standard" split
  lc     — LIVECell-shaped statistics (~305 instances/frame,
           lognormal radii, 3:1 aspects; README.md:324-327)
  dense  — 500 cells/frame (~111 instances/tile) stress split

Each root gets `src/` (704x520 frames + COCO JSONs, the reference's
raw layout) and `split/` (5x5 tile tree via livecell_tpu.data.tiling,
the reference's preprocess_dataset.py geometry).

  python scripts/make_synth_splits.py --roots sparse:/tmp/synth \
      lc:/tmp/lc dense:/tmp/dense [--frames 14 3 3]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MODES = {
    "sparse": dict(cells_per_image=12),
    "lc": dict(stats="livecell"),
    "dense": dict(cells_per_image=500),
}


def build(name: str, root: Path, frames, seed: int) -> None:
    from tests.util_fakedata import make_fake_livecell

    src = root / "src"
    if not (root / "split" / "train").exists():
        make_fake_livecell(src, images_per_split=tuple(frames),
                           seed=seed, **MODES[name])
        r = subprocess.run(
            [sys.executable, "-m", "livecell_tpu.data.tiling",
             "--source_dir", str(src), "--output_dir", str(root / "split"),
             "--num_images_per_split", str(sum(frames))],
            cwd=REPO, capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-1500:], r.stderr[-1500:], file=sys.stderr)
            raise SystemExit(f"tiling failed for {name}")
    print(f"[{name}] ready at {root}/split", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--roots", nargs="+",
                        default=["sparse:/tmp/synth", "lc:/tmp/lc",
                                 "dense:/tmp/dense"])
    parser.add_argument("--frames", nargs=3, type=int, default=[14, 3, 3],
                        help="source frames per train/val/test split")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    for pair in args.roots:
        name, root = pair.split(":", 1)
        build(name, Path(root), args.frames, args.seed)


if __name__ == "__main__":
    main()
