"""Full-frame tiled inference with overlap-dedup stitching.

TPU-native rework of the reference serve path (reference src/visualize.py):
the reference runs 25 sequential single-tile forwards
(visualize.py:133-148) and dedups detections in Python
(visualize.py:174-257). Here all 25 tiles go through ONE batched jitted
forward, and the dedup rule is precomputed into static per-tile
"newly claimed mini-tile" region masks so the keep decision is a single
device reduction:

  * tile t owns its center mini-tile plus any grid-border mini-tiles in
    its 3x3 window (visualize.py:151-171),
  * tiles claim minis in ascending tile_num order, first claim wins
    (visualize.py:182-255) — a pure geometry fact, precomputed host-side,
  * a detection is kept iff the fraction of its mask area inside its
    tile's newly-claimed region exceeds mask_threshold
    (visualize.py:222-236).
"""

from __future__ import annotations

import os
import re
from collections import defaultdict
from typing import Dict, List, NamedTuple

import numpy as np

from livecell_tpu.config import TileConfig

TILE_RE = re.compile(r"^(.+)_tile_(\d{2})\.png$")


def group_tiles_by_image(test_dir: str) -> Dict[str, List[Dict]]:
    """Group tile files by source frame (reference visualize.py:72-97)."""
    groups: Dict[str, List[Dict]] = defaultdict(list)
    if not os.path.isdir(test_dir):
        print(f"Error: test directory {test_dir} does not exist.")
        return {}
    for filename in sorted(os.listdir(test_dir)):
        m = TILE_RE.match(filename)
        if m:
            groups[m.group(1)].append({
                "path": os.path.join(test_dir, filename),
                "tile_num": int(m.group(2)),
                "filename": filename,
            })
    return {k: sorted(v, key=lambda x: x["tile_num"])
            for k, v in groups.items()}


def tile_position(tile_num: int, tiles_per_row: int) -> tuple[int, int]:
    """(col_start, row_start) in mini-tile units (visualize.py:100-103)."""
    return tile_num % tiles_per_row, tile_num // tiles_per_row


def claimed_regions(cfg: TileConfig) -> np.ndarray:
    """Static per-tile newly-claimed region masks.

    Returns float32 [num_tiles, tile_h, tile_w]: 1 where a pixel of tile t
    (tile-local coordinates) lies in a mini-tile that t is first to claim.
    Encodes the full first-claim-wins protocol of
    visualize.py:151-171,182-255.
    """
    g, w = cfg.grid_size, cfg.window_size
    mini_w, mini_h = cfg.mini_tile_width, cfg.mini_tile_height
    tpr = cfg.tiles_per_row

    processed = set()
    regions = np.zeros((cfg.num_tiles, cfg.tile_height, cfg.tile_width),
                       np.float32)
    for t in range(cfg.num_tiles):
        col0, row0 = tile_position(t, tpr)
        for lr in range(w):
            for lc in range(w):
                mc, mr = col0 + lc, row0 + lr
                is_center = (lc == 1 and lr == 1)
                is_border = (mc == 0 or mc == g - 1 or mr == 0 or
                             mr == g - 1)
                if not (is_center or is_border):
                    continue
                if (mc, mr) in processed:
                    continue
                processed.add((mc, mr))
                y0, x0 = lr * mini_h, lc * mini_w
                regions[t, y0:y0 + mini_h, x0:x0 + mini_w] = 1.0
    return regions


class StitchedDetections(NamedTuple):
    boxes: np.ndarray    # [N, 4] global frame coords
    scores: np.ndarray   # [N]
    masks: np.ndarray    # [N, tile_h, tile_w] bool, tile-local
    offsets: np.ndarray  # [N, 2] (x_offset, y_offset) of the source tile
    tile_nums: np.ndarray  # [N]


def make_frame_predictor(model, variables, tile_cfg: TileConfig,
                         score_threshold: float = 0.5,
                         mask_threshold: float = 0.4,
                         mesh=None, max_frame_dets: int = 256):
    """Build a jitted 25-tile frame predictor with fused dedup.

    Returns predict(tiles_u8 [T, th, tw, 3]) -> StitchedDetections.

    With `mesh`, the frame's tiles are sharded across the 'data' axis —
    this workload's analog of sequence parallelism (SURVEY.md §2.7):
    each chip detects on its share of the overlapping tiles and XLA
    gathers the fixed-slot detections. Tiles are padded to a multiple of
    the axis size with zero claim-regions, so pad tiles keep nothing.
    """
    import jax
    import jax.numpy as jnp

    from livecell_tpu.ops.mask_ops import paste_masks

    mcfg = model.cfg
    regions = claimed_regions(tile_cfg)            # [T, th, tw]
    th, tw = tile_cfg.tile_height, tile_cfg.tile_width
    tpr = tile_cfg.tiles_per_row
    mini_w, mini_h = tile_cfg.mini_tile_width, tile_cfg.mini_tile_height
    t_idx = np.arange(tile_cfg.num_tiles)
    offs = np.stack([(t_idx % tpr) * mini_w, (t_idx // tpr) * mini_h],
                    axis=1).astype(np.float32)     # [T, 2] (x, y)

    n_real = tile_cfg.num_tiles
    shard_n = 1
    bsh = None
    if mesh is not None:
        from livecell_tpu.parallel.mesh import batch_sharding

        shard_n = int(mesh.devices.shape[0])
        bsh = batch_sharding(mesh)
    n_pad_tiles = ((n_real + shard_n - 1) // shard_n) * shard_n
    if n_pad_tiles > n_real:
        regions = np.concatenate(
            [regions, np.zeros((n_pad_tiles - n_real, th, tw),
                               np.float32)])
    tw_pad = ((tw + 7) // 8) * 8
    # Flat candidate pool is [T, max_detections] (the det slot count).
    max_frame_dets = min(max_frame_dets,
                         n_pad_tiles * mcfg.max_detections)

    @jax.jit
    def predict(tiles_u8):
        images = tiles_u8.astype(jnp.float32) / 255.0
        pad_h = mcfg.image_height - th
        pad_w = mcfg.image_width - tw
        images = jnp.pad(images, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

        det = model.apply(variables, images, train=False)

        def per_tile(boxes, probs, valid, scores, region):
            masks = paste_masks(
                probs, boxes, (mcfg.image_height, mcfg.image_width),
                valid=valid)                        # [D, H, W] uint8
            masks = masks[:, :th, :tw] > 0
            area = masks.sum(axis=(1, 2)).astype(jnp.float32)
            inside = (masks * region[None]).sum(axis=(1, 2))
            frac = jnp.where(area > 0, inside / jnp.maximum(area, 1.0), 0.0)
            keep = valid & (scores > score_threshold) & \
                (frac > mask_threshold)
            return masks, keep

        masks, keep = jax.vmap(per_tile)(
            det.boxes, det.mask_probs, det.valid, det.scores,
            jnp.asarray(regions))

        # Global compaction to max_frame_dets slots + bit-packed masks:
        # the full [T, D, th, tw] mask tensor is ~100 MB and the
        # host<->device link is the serve-latency bottleneck; survivors
        # packed 8px/byte are ~2 MB.
        t_total, d = keep.shape
        real_tile = jnp.arange(t_total) < n_real
        pri = jnp.where(keep & real_tile[:, None],
                        det.scores + 1.0, 0.0).reshape(-1)
        top, idx = jax.lax.top_k(pri, max_frame_dets)
        sel_valid = top > 0.5
        sel_masks = masks.reshape(t_total * d, th, tw)[idx]
        packed = jnp.einsum(
            "mhwb,b->mhw",
            jnp.pad(sel_masks, ((0, 0), (0, 0), (0, tw_pad - tw)))
            .reshape(max_frame_dets, th, tw_pad // 8, 8)
            .astype(jnp.uint8),
            jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8),
            preferred_element_type=jnp.uint8)
        sel_boxes = det.boxes.reshape(t_total * d, 4)[idx]
        sel_scores = det.scores.reshape(-1)[idx]
        return sel_boxes, sel_scores, packed, idx, sel_valid

    def dispatch(tiles_u8: np.ndarray):
        """Enqueue one frame on the device; returns device arrays
        without blocking on the result (JAX async dispatch). Pair with
        fetch() to double-buffer frames: frame N's fetch/unpack then
        overlaps frame N+1's device compute (serve/pipeline.py)."""
        if len(tiles_u8) < n_pad_tiles:
            tiles_u8 = np.concatenate(
                [tiles_u8, np.zeros((n_pad_tiles - len(tiles_u8), th, tw,
                                     3), np.uint8)])
        tiles_dev = jnp.asarray(tiles_u8)
        if bsh is not None:
            tiles_dev = jax.device_put(tiles_dev, bsh)
        return predict(tiles_dev)

    def fetch(handle) -> StitchedDetections:
        """Block on a dispatch() handle and unpack to host dets."""
        boxes, scores, packed, idx, sel_valid = jax.tree.map(
            np.asarray, handle)
        v = np.array(sel_valid)
        masks = np.unpackbits(packed[v], axis=-1)[:, :, :tw].astype(bool)
        # idx is flat over [T, D] where D is the detection slot count
        # (max_detections), which can differ from infer_post_nms when
        # dense-scene flags lift the caps asymmetrically.
        t_ids = idx[v] // mcfg.max_detections
        sel_off = offs[np.minimum(t_ids, len(offs) - 1)]
        global_boxes = boxes[v] + np.concatenate([sel_off, sel_off],
                                                 axis=1)
        return StitchedDetections(
            boxes=global_boxes, scores=scores[v], masks=masks,
            offsets=sel_off, tile_nums=t_ids)

    def run(tiles_u8: np.ndarray) -> StitchedDetections:
        return fetch(dispatch(tiles_u8))

    # The raw jitted device computation (u8 tiles -> packed detections),
    # exposed so benchmarks can attribute device time vs host/tunnel
    # overhead (scripts/bench_serve.py); dispatch/fetch expose the
    # two-phase path for pipelined double-buffering.
    run.device_fn = predict
    run.n_pad_tiles = n_pad_tiles
    run.dispatch = dispatch
    run.fetch = fetch
    return run


def reconstruct_full_image(tiles_u8: np.ndarray, cfg: TileConfig
                           ) -> np.ndarray:
    """Paste tiles back into the frame, first cover wins
    (reference visualize.py:281-309). Returns float [H, W, 3] in [0,1]."""
    canvas = np.zeros((cfg.frame_height, cfg.frame_width, 3), np.float32)
    covered = np.zeros((cfg.frame_height, cfg.frame_width), bool)
    for t in range(len(tiles_u8)):
        col0, row0 = tile_position(t, cfg.tiles_per_row)
        x0, y0 = col0 * cfg.mini_tile_width, row0 * cfg.mini_tile_height
        h, w = tiles_u8[t].shape[:2]
        y1, x1 = min(y0 + h, cfg.frame_height), min(x0 + w, cfg.frame_width)
        patch = tiles_u8[t][:y1 - y0, :x1 - x0].astype(np.float32) / 255.0
        un = ~covered[y0:y1, x0:x1]
        canvas[y0:y1, x0:x1][un] = patch[un]
        covered[y0:y1, x0:x1] = True
    return canvas


def load_tiles(tiles_info: List[Dict], cfg: TileConfig) -> np.ndarray:
    """Read one frame's tile PNGs into [T, th, tw, 3] uint8 (missing tiles
    are zero-filled)."""
    from PIL import Image

    out = np.zeros((cfg.num_tiles, cfg.tile_height, cfg.tile_width, 3),
                   np.uint8)
    for info in tiles_info:
        with Image.open(info["path"]) as im:
            arr = np.asarray(im.convert("RGB"), np.uint8)
        t = info["tile_num"]
        h = min(arr.shape[0], cfg.tile_height)
        w = min(arr.shape[1], cfg.tile_width)
        out[t, :h, :w] = arr[:h, :w]
    return out
