"""Tiling preprocessor + packed dataset + COCO tooling tests."""

import json

import numpy as np
import pytest

from livecell_tpu.data.coco import (
    CocoIndex, polygons_to_mask, rle_decode, rle_encode)
from livecell_tpu.data.dataset import PackedDataset, pad_image_batch
from livecell_tpu.data.tiling import (
    LIVECellPreprocessor, remap_annotation, tile_coordinates, tile_grid)
from livecell_tpu.config import ModelConfig
from tests.util_fakedata import make_fake_livecell


# ----------------------------------------------------------------------
# RLE / polygon
# ----------------------------------------------------------------------

def test_rle_roundtrip(rng):
    mask = (rng.uniform(size=(37, 23)) > 0.7).astype(np.uint8)
    assert (rle_decode(rle_encode(mask)) == mask).all()


def test_rle_decode_compressed_string():
    # 3x3 all-ones mask encoded with pycocotools: counts start with a 0 run.
    mask = np.ones((3, 3), np.uint8)
    enc = rle_encode(mask)
    assert enc["counts"] == [0, 9]


def test_polygon_rectangle_exact():
    # Rectangle [1,1]-[5,4): pixel centers 1.5..4.5 x / 1.5..3.5 y inside.
    m = polygons_to_mask([[1, 1, 5, 1, 5, 4, 1, 4]], 6, 7)
    want = np.zeros((6, 7), np.uint8)
    want[1:4, 1:5] = 1
    assert (m == want).all()


def test_polygon_triangle_area():
    m = polygons_to_mask([[0, 0, 20, 0, 0, 20]], 20, 20)
    # Triangle area 200; scanline count should be close.
    assert abs(int(m.sum()) - 200) < 25


def test_polygon_union_of_parts():
    m = polygons_to_mask([[0, 0, 4, 0, 4, 4, 0, 4],
                          [6, 6, 9, 6, 9, 9, 6, 9]], 10, 10)
    assert m[1, 1] == 1 and m[7, 7] == 1 and m[5, 5] == 0


# ----------------------------------------------------------------------
# Tiling geometry (reference preprocess_dataset.py:86-124)
# ----------------------------------------------------------------------

def test_tile_grid_constants():
    assert tile_grid(704, 520, 7) == (100, 74)


def test_tile_coordinates_25_windows():
    coords = tile_coordinates(7, 100, 74)
    assert len(coords) == 25
    assert coords[0] == (0, 0, 300, 222)
    assert coords[4] == (400, 0, 700, 222)
    assert coords[24] == (400, 296, 700, 518)


def test_remap_annotation_rules():
    tile = (100, 100, 400, 322)
    # Fully inside
    ann = {"bbox": [150, 150, 40, 30], "segmentation": [[150, 150, 190,
           150, 190, 180, 150, 180]], "category_id": 1}
    out = remap_annotation(ann, tile)
    assert out["bbox"] == [50, 50, 40, 30]
    assert out["area"] == 1200
    # < 30% overlap dropped
    ann2 = {"bbox": [80, 150, 40, 30], "segmentation": [[80, 150, 120, 150,
            120, 180, 80, 180]], "category_id": 1}
    # overlap width = 20/40 -> 50% of area: kept
    assert remap_annotation(ann2, tile) is not None
    ann3 = {"bbox": [70, 150, 40, 30], "segmentation": [[70, 150, 110, 150,
            110, 180, 70, 180]], "category_id": 1}
    # overlap width = 10/40 -> 25% of area: dropped
    assert remap_annotation(ann3, tile) is None
    # polygon clamped to tile bounds
    out2 = remap_annotation(ann2, tile)
    seg = np.asarray(out2["segmentation"][0])
    assert (seg[0::2] >= 0).all() and (seg[0::2] <= 300).all()


# ----------------------------------------------------------------------
# End-to-end: fake source -> tiler -> packed dataset
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiled_tree(tmp_path_factory):
    src = make_fake_livecell(tmp_path_factory.mktemp("src"),
                             images_per_split=(3, 1, 1))
    out = tmp_path_factory.mktemp("out")
    pre = LIVECellPreprocessor(str(src), str(out), total_images=5)
    pre.preprocess()
    return out


def test_tiler_outputs(tiled_tree):
    train_imgs = sorted((tiled_tree / "train" / "images").glob("*.png"))
    # 3 source images x 25 tiles (70% of 5 = 3 requested, 3 available)
    assert len(train_imgs) == 75
    assert train_imgs[0].name.endswith("_tile_00.png")
    from PIL import Image

    with Image.open(train_imgs[0]) as im:
        assert im.size == (300, 222)

    with open(tiled_tree / "annotations" / "livecell_coco_train.json") as f:
        data = json.load(f)
    assert len(data["images"]) == 75
    assert data["annotations"], "tiles should carry remapped annotations"
    for ann in data["annotations"]:
        x, y, w, h = ann["bbox"]
        assert 0 <= x <= 300 and 0 <= y <= 222
        assert ann["id"] // 10000 == ann["image_id"]


def test_packed_dataset(tiled_tree):
    cfg = ModelConfig(max_instances=32)
    ds = PackedDataset(str(tiled_tree), "train", cfg)
    assert len(ds) == 75
    assert ds.tile_hw == (222, 300)
    assert ds.mask28.dtype == np.uint8
    assert ds.boxes.shape[1] == 4

    images, targets, bvalid = next(iter(ds.batches(4)))
    assert images.shape == (4, cfg.image_height, cfg.image_width, 3)
    # Batches travel uint8; the jitted step normalizes on device.
    assert images.dtype == np.uint8
    assert targets["boxes"].shape == (4, 32, 4)
    assert targets["mask28"].shape == (4, 32, 28, 28)
    assert targets["mask28"].dtype == np.uint8
    assert targets["valid"].any()
    assert bvalid.all()
    # mask28 targets contain actual foreground
    v = targets["valid"]
    assert targets["mask28"][v].max() > 127


def test_packed_dataset_cache_reload(tiled_tree):
    cfg = ModelConfig(max_instances=32)
    ds1 = PackedDataset(str(tiled_tree), "test", cfg)
    ds2 = PackedDataset(str(tiled_tree), "test", cfg)  # from cache
    assert (ds1.boxes == ds2.boxes).all()
    assert (ds1.mask28 == ds2.mask28).all()


def test_final_batch_padding(tiled_tree):
    cfg = ModelConfig(max_instances=32)
    ds = PackedDataset(str(tiled_tree), "test", cfg)  # 25 tiles
    batches = list(ds.batches(4))
    assert len(batches) == 7
    _, _, bvalid = batches[-1]
    assert bvalid.sum() == 25 - 6 * 4


def test_pad_image_batch():
    x = np.full((2, 10, 12, 3), 255, np.uint8)
    out = pad_image_batch(x, (16, 20))
    assert out.shape == (2, 16, 20, 3)
    assert out[:, :10, :12].min() == 1.0
    assert out[:, 10:].max() == 0.0


def test_coco_index(tiled_tree):
    idx = CocoIndex(tiled_tree / "annotations" / "livecell_coco_train.json")
    ids = idx.get_img_ids()
    assert len(ids) == 75
    anns = idx.get_anns(ids[0])
    for a in anns:
        assert a["image_id"] == ids[0]


def test_remap_annotation_rle_segmentation():
    """Dict-RLE segmentations are decoded, cropped to the tile, and
    re-encoded — never passed through with untranslated coordinates."""
    from livecell_tpu.data.coco import rle_decode, rle_encode

    dense = np.zeros((100, 200), np.uint8)
    dense[40:60, 120:160] = 1  # blob inside the tile below
    ann = {"bbox": [120, 40, 40, 20], "segmentation": rle_encode(dense),
           "category_id": 1, "id": 7}
    tile = (100, 20, 200, 100)  # x_min, y_min, x_max, y_max
    out = remap_annotation(ann, tile)
    assert out is not None
    seg = out["segmentation"]
    assert isinstance(seg, dict) and seg["size"] == [80, 100]
    got = rle_decode(seg)
    want = dense[20:100, 100:200]
    np.testing.assert_array_equal(got, want)
    # Fully-outside blob drops the annotation.
    ann2 = {"bbox": [0, 0, 40, 20], "segmentation": rle_encode(
        (np.arange(200)[None, :] < 40).astype(np.uint8) *
        (np.arange(100)[:, None] < 20).astype(np.uint8)),
        "category_id": 1, "id": 8}
    assert remap_annotation(ann2, tile) is None
