"""Tile-parallel frame serving on the virtual 8-device mesh."""

import jax
import numpy as np
import pytest

from livecell_tpu.config import TileConfig
from livecell_tpu.parallel.mesh import make_mesh
from livecell_tpu.serve.stitch import make_frame_predictor
from tests.test_model import TINY


@pytest.fixture(scope="module")
def tiny_frame_setup():
    from livecell_tpu.models.mask_rcnn import create_model

    # Tiny tile geometry: 4x4 mini grid of 16x12, window 3 -> 2x2=4 tiles
    # of 48x36; model input 64x96 covers the 48x36 tiles.
    tcfg = TileConfig(frame_width=64, frame_height=48, tiles_per_image=4)
    assert tcfg.grid_size == 4 and tcfg.num_tiles == 4
    model, variables = create_model(TINY, jax.random.key(0))
    return model, variables, tcfg


def test_frame_predictor_single_device(tiny_frame_setup):
    model, variables, tcfg = tiny_frame_setup
    predict = make_frame_predictor(model, variables, tcfg,
                                   score_threshold=0.0)
    tiles = np.random.default_rng(0).integers(
        0, 255, (tcfg.num_tiles, tcfg.tile_height, tcfg.tile_width, 3),
        dtype=np.uint8)
    out = predict(tiles)
    assert out.boxes.ndim == 2 and out.boxes.shape[1] == 4
    assert len(out.scores) == len(out.masks) == len(out.tile_nums)


def test_frame_predictor_tile_parallel_matches(tiny_frame_setup):
    model, variables, tcfg = tiny_frame_setup
    tiles = np.random.default_rng(1).integers(
        0, 255, (tcfg.num_tiles, tcfg.tile_height, tcfg.tile_width, 3),
        dtype=np.uint8)

    single = make_frame_predictor(model, variables, tcfg,
                                  score_threshold=0.0)(tiles)
    mesh = make_mesh(8, model_parallel=2)  # 4-way tile sharding
    sharded = make_frame_predictor(model, variables, tcfg,
                                   score_threshold=0.0, mesh=mesh)(tiles)

    assert len(sharded.scores) == len(single.scores)
    order_a = np.lexsort((single.scores,))
    order_b = np.lexsort((sharded.scores,))
    np.testing.assert_allclose(sharded.boxes[order_b],
                               single.boxes[order_a], rtol=1e-3, atol=0.1)
