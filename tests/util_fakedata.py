"""Synthetic LIVECell-style fixture data for tests and smoke runs."""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw


def ellipse_polygon(cx, cy, rx, ry, n=16):
    pts = []
    for i in range(n):
        a = 2 * math.pi * i / n
        pts.extend([cx + rx * math.cos(a), cy + ry * math.sin(a)])
    return pts


def make_fake_livecell(root: Path, images_per_split=(4, 1, 1),
                       frame_w=704, frame_h=520, cells_per_image=12,
                       seed=0):
    """Build a minimal LIVECell source tree: per-split image dirs + COCO
    JSONs with polygon annotations, file names prefixed 'A172'."""
    root = Path(root)
    rng = np.random.default_rng(seed)
    categories = [{"id": 1, "name": "cell"}]
    img_id = 0
    ann_id = 0
    for split, n_imgs in zip(("train", "val", "test"), images_per_split):
        img_dir = root / split / "images"
        img_dir.mkdir(parents=True, exist_ok=True)
        images, annotations = [], []
        for i in range(n_imgs):
            img_id += 1
            name = f"A172_Phase_{split}_{i:03d}.tif"
            canvas = Image.new("L", (frame_w, frame_h), 30)
            draw = ImageDraw.Draw(canvas)
            for _ in range(cells_per_image):
                cx = rng.uniform(30, frame_w - 30)
                cy = rng.uniform(30, frame_h - 30)
                rx = rng.uniform(12, 30)
                ry = rng.uniform(12, 30)
                draw.ellipse([cx - rx, cy - ry, cx + rx, cy + ry],
                             fill=int(rng.uniform(120, 220)))
                poly = ellipse_polygon(cx, cy, rx, ry)
                xs, ys = poly[0::2], poly[1::2]
                x1, y1 = max(min(xs), 0), max(min(ys), 0)
                x2, y2 = min(max(xs), frame_w), min(max(ys), frame_h)
                ann_id += 1
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": 1,
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "segmentation": [poly], "iscrowd": 0,
                })
            canvas.save(img_dir / name)
            images.append({"id": img_id, "file_name": name,
                           "width": frame_w, "height": frame_h})
        ann_dir = root / "annotations"
        ann_dir.mkdir(parents=True, exist_ok=True)
        with open(ann_dir / f"livecell_coco_{split}.json", "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": categories}, f)
    return root
