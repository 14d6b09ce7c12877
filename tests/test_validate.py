"""Dataset schema validator + DVC CLI + LIVECell-stats generator tests."""

import json

import numpy as np
import pytest

from livecell_tpu.data.validate import validate_tree
from tests.util_fakedata import make_fake_livecell


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return make_fake_livecell(tmp_path_factory.mktemp("src"),
                              images_per_split=(2, 1, 1))


def test_valid_tree_passes(tree):
    reports = validate_tree(str(tree))
    assert all(r.ok for r in reports), [r.errors for r in reports]
    train = reports[0]
    assert train.split == "train"
    assert train.n_images == 2
    assert train.n_polygon == train.n_annotations > 0
    assert train.instances_per_image_max >= 1


def test_missing_image_on_disk(tree, tmp_path):
    import shutil

    bad = tmp_path / "bad"
    shutil.copytree(tree, bad)
    victim = next((bad / "train" / "images").iterdir())
    victim.unlink()
    reports = validate_tree(str(bad))
    train = [r for r in reports if r.split == "train"][0]
    assert not train.ok
    assert any("missing on disk" in e for e in train.errors)


def test_malformed_annotations(tree, tmp_path):
    import shutil

    bad = tmp_path / "bad2"
    shutil.copytree(tree, bad)
    ann = bad / "annotations" / "livecell_coco_val.json"
    coco = json.loads(ann.read_text())
    coco["annotations"][0]["segmentation"] = 42      # neither form
    coco["annotations"].append({"id": 9999, "image_id": 123456,
                                "category_id": 1, "bbox": [1, 1, 2, 2],
                                "segmentation": [[0, 0, 1, 0, 1, 1]]})
    ann.write_text(json.dumps(coco))
    reports = validate_tree(str(bad))
    val = [r for r in reports if r.split == "val"][0]
    assert not val.ok
    msgs = " ".join(val.errors)
    assert "unknown image_id" in msgs
    assert "neither polygon" in msgs


def test_rle_segmentation_counted(tree, tmp_path):
    import shutil

    bad = tmp_path / "rle"
    shutil.copytree(tree, bad)
    ann = bad / "annotations" / "livecell_coco_test.json"
    coco = json.loads(ann.read_text())
    coco["annotations"][0]["segmentation"] = {
        "counts": [10, 5, 10], "size": [520, 704]}
    ann.write_text(json.dumps(coco))
    reports = validate_tree(str(bad))
    test = [r for r in reports if r.split == "test"][0]
    assert test.ok and test.n_rle == 1


def test_validator_cli(tree, capsys):
    from livecell_tpu.data.validate import main

    assert main(["--data_dir", str(tree)]) == 0
    out = capsys.readouterr().out
    assert "passed" in out
    assert main(["--data_dir", str(tree / "nonexistent")]) == 1


def test_dvc_cli(tree, tmp_path, capsys):
    from livecell_tpu.data.dvc import main

    out_file = tmp_path / "tree.dvc"
    assert main(["--path", str(tree), "--out", str(out_file)]) == 0
    text = out_file.read_text()
    assert "md5:" in text and ".dir" in text and "nfiles:" in text


def test_livecell_stats_generator(tmp_path):
    from tests.util_fakedata import (
        LIVECELL_MEAN_INSTANCES_PER_FRAME, sample_livecell_instances)

    rng = np.random.default_rng(0)
    counts, radii = [], []
    for _ in range(20):
        cells = sample_livecell_instances(rng, 704, 520)
        counts.append(len(cells))
        radii.extend(float(np.sqrt(rx * ry)) for _, _, rx, ry, _ in cells)
    mean_count = float(np.mean(counts))
    # ~305 instances/frame (README.md:324-327: 1.6M / 5,239).
    assert 200 < mean_count < 420
    med = float(np.median(radii))
    assert 7 < med < 14          # ~10 px equivalent radius median
    # Elongation present: some instances are clearly non-circular.
    aspects = []
    rng2 = np.random.default_rng(1)
    for _, _, rx, ry, _ in sample_livecell_instances(rng2, 704, 520):
        aspects.append(rx / ry)
    assert max(aspects) > 2.0

    # End-to-end: the stats tree is a valid LIVECell source tree with
    # dense frames (small images_per_split keeps this test fast).
    root = make_fake_livecell(tmp_path / "lc", images_per_split=(1, 1, 1),
                              stats="livecell", seed=7)
    reports = validate_tree(str(root))
    assert all(r.ok for r in reports)
    train = reports[0]
    assert train.instances_per_image_max > 150
