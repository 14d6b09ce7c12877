"""Synthetic LIVECell-style fixture data for tests and smoke runs."""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw


def ellipse_polygon(cx, cy, rx, ry, n=16, theta=0.0):
    """Polygon of an ellipse rotated by `theta` radians."""
    ct, st = math.cos(theta), math.sin(theta)
    pts = []
    for i in range(n):
        a = 2 * math.pi * i / n
        ex, ey = rx * math.cos(a), ry * math.sin(a)
        pts.extend([cx + ex * ct - ey * st, cy + ex * st + ey * ct])
    return pts


# LIVECell-scale morphology (reference README.md:324-327: 5,239 frames,
# >1.6M instances => ~305 instances per 704x520 frame; the LIVECell
# paper's per-type size distributions span ~100-3000 px^2 with a median
# near 300-400 px^2, i.e. equivalent radius ~10 px, and elongated types
# like SHSY5Y reach ~3:1 aspect).
LIVECELL_MEAN_INSTANCES_PER_FRAME = 305
LIVECELL_RADIUS_MEDIAN_PX = 10.0
LIVECELL_RADIUS_SIGMA = 0.45        # lognormal sigma of equiv. radius
LIVECELL_MAX_ASPECT = 3.0


def sample_livecell_instances(rng, frame_w, frame_h,
                              mean_count=LIVECELL_MEAN_INSTANCES_PER_FRAME):
    """Sample (cx, cy, rx, ry, theta) tuples with LIVECell-like
    per-frame count and size statistics: Poisson-ish frame density,
    lognormal equivalent radius, uniform elongation up to 3:1."""
    count = max(1, int(rng.normal(mean_count, mean_count * 0.25)))
    out = []
    for _ in range(count):
        r = LIVECELL_RADIUS_MEDIAN_PX * math.exp(
            rng.normal(0.0, LIVECELL_RADIUS_SIGMA))
        aspect = rng.uniform(1.0, LIVECELL_MAX_ASPECT)
        rx, ry = r * math.sqrt(aspect), r / math.sqrt(aspect)
        out.append((rng.uniform(5, frame_w - 5), rng.uniform(5, frame_h - 5),
                    rx, ry, rng.uniform(0, math.pi)))
    return out


def make_fake_livecell(root: Path, images_per_split=(4, 1, 1),
                       frame_w=704, frame_h=520, cells_per_image=12,
                       seed=0, stats=None, mean_instances=None):
    """Build a minimal LIVECell source tree: per-split image dirs + COCO
    JSONs with polygon annotations, file names prefixed 'A172'.

    stats="livecell" replaces the uniform-ellipse sampler with
    LIVECell-shaped per-frame statistics (see sample_livecell_instances):
    ~305 rotated, elongated instances per frame with a lognormal size
    distribution — the closest achievable proxy for the real dataset in
    a zero-egress image. `mean_instances` overrides the per-frame mean
    (default LIVECELL_MEAN_INSTANCES_PER_FRAME); `cells_per_image` only
    applies to the uniform mode.
    """
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
            if stats == "livecell":
                mean = mean_instances or LIVECELL_MEAN_INSTANCES_PER_FRAME
                cells = sample_livecell_instances(rng, frame_w, frame_h,
                                                  mean_count=mean)
            else:
                cells = [(rng.uniform(30, frame_w - 30),
                          rng.uniform(30, frame_h - 30),
                          rng.uniform(12, 30), rng.uniform(12, 30), 0.0)
                         for _ in range(cells_per_image)]
            for cx, cy, rx, ry, theta in cells:
                poly = ellipse_polygon(cx, cy, rx, ry, theta=theta)
                draw.polygon(list(zip(poly[0::2], poly[1::2])),
                             fill=int(rng.uniform(120, 220)))
                xs, ys = poly[0::2], poly[1::2]
                x1, y1 = max(min(xs), 0), max(min(ys), 0)
                x2, y2 = min(max(xs), frame_w), min(max(ys), frame_h)
                if x2 - x1 < 1 or y2 - y1 < 1:
                    continue  # fully outside after clamping
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
