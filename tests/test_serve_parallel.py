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


@pytest.mark.slow
def test_frame_predictor_dense_dets(tiny_frame_setup):
    """Dense-scene flags (--dets 256) flow through the stitch path:
    detection slots widen and tile attribution stays correct even when
    max_detections != infer_post_nms."""
    import dataclasses

    from livecell_tpu.config import apply_dense_flags
    from livecell_tpu.models.mask_rcnn import create_model

    _, _, tcfg = tiny_frame_setup
    dense = apply_dense_flags(TINY, dets=256)
    # Asymmetric caps: more NMS survivors than final detection slots.
    dense = dataclasses.replace(dense, infer_pre_topk=64,
                                infer_post_nms=32, max_detections=16)
    model, variables = create_model(dense, jax.random.key(0))
    predict = make_frame_predictor(model, variables, tcfg,
                                   score_threshold=0.0)
    tiles = np.random.default_rng(2).integers(
        0, 255, (tcfg.num_tiles, tcfg.tile_height, tcfg.tile_width, 3),
        dtype=np.uint8)
    out = predict(tiles)
    assert out.boxes.ndim == 2 and out.boxes.shape[1] == 4
    assert (out.tile_nums < tcfg.num_tiles).all()
    # Offsets must correspond to the claimed tile positions.
    from livecell_tpu.serve.stitch import tile_position
    for t, off in zip(out.tile_nums, out.offsets):
        c0, r0 = tile_position(int(t), tcfg.tiles_per_row)
        assert off[0] == c0 * tcfg.mini_tile_width
        assert off[1] == r0 * tcfg.mini_tile_height


def test_apply_dense_flags_values():
    from livecell_tpu.config import apply_dense_flags

    m = apply_dense_flags(TINY, dets=256, infer_nms=0.7, det_nms=0.6)
    assert m.infer_pre_topk == 1280
    assert m.infer_post_nms == 256 and m.max_detections == 256
    assert m.infer_nms_thresh == 0.7 and m.det_nms_thresh == 0.6
    # Zero keeps reference behavior.
    same = apply_dense_flags(TINY)
    assert same == TINY


@pytest.mark.slow
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
