"""Tile stitching / dedup geometry tests."""

import numpy as np

from livecell_tpu.config import TileConfig
from livecell_tpu.serve.stitch import (
    claimed_regions, group_tiles_by_image, reconstruct_full_image,
    tile_position)

CFG = TileConfig()


def test_tile_position():
    assert tile_position(0, 5) == (0, 0)
    assert tile_position(4, 5) == (4, 0)
    assert tile_position(5, 5) == (0, 1)
    assert tile_position(24, 5) == (4, 4)


def test_claimed_regions_partition():
    regions = claimed_regions(CFG)
    assert regions.shape == (25, 222, 300)
    # Every mini-tile of the 7x7 grid is claimed exactly once globally:
    # map each tile's local region back to global coordinates and sum.
    total = np.zeros((CFG.frame_height, CFG.frame_width), np.float32)
    for t in range(25):
        c0, r0 = tile_position(t, 5)
        x0, y0 = c0 * CFG.mini_tile_width, r0 * CFG.mini_tile_height
        total[y0:y0 + 222, x0:x0 + 300] += regions[t]
    covered = total[:CFG.mini_tile_height * 7, :CFG.mini_tile_width * 7]
    assert covered.max() == 1.0 and covered.min() == 1.0


def test_claimed_regions_first_tile_gets_center_and_border():
    regions = claimed_regions(CFG)
    # Tile 0's window covers minis (0..2, 0..2): center (1,1) + the five
    # border minis (0,0),(1,0),(2,0),(0,1),(0,2) -> 6 minis claimed.
    area = regions[0].sum()
    assert area == 6 * CFG.mini_tile_width * CFG.mini_tile_height


def test_group_tiles_by_image(tmp_path):
    for name in ("imgA_tile_00.png", "imgA_tile_07.png",
                 "imgB_tile_24.png", "notatile.png"):
        (tmp_path / name).write_bytes(b"")
    groups = group_tiles_by_image(str(tmp_path))
    assert set(groups) == {"imgA", "imgB"}
    assert [t["tile_num"] for t in groups["imgA"]] == [0, 7]


def test_reconstruct_full_image_covers_frame():
    tiles = np.full((25, 222, 300, 3), 128, np.uint8)
    canvas = reconstruct_full_image(tiles, CFG)
    # Mini grid covers 700x518 of the 704x520 frame.
    assert canvas[:518, :700].min() > 0.49
    assert canvas[519:, 701:].max() == 0.0
