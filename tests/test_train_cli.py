"""End-to-end CLI integration test at reduced scale (CPU, fake data)."""

import dataclasses
import json
import os

import numpy as np
import pytest

from livecell_tpu.config import Config, ModelConfig, TrainConfig
from livecell_tpu.data.tiling import LIVECellPreprocessor
from tests.test_model import TINY
from tests.util_fakedata import make_fake_livecell

pytestmark = pytest.mark.slow  # heavy integration tier (see pyproject.toml)


@pytest.fixture(scope="module")
def small_split(tmp_path_factory):
    src = make_fake_livecell(tmp_path_factory.mktemp("src"),
                             images_per_split=(2, 1, 1),
                             cells_per_image=8)
    out = tmp_path_factory.mktemp("split")
    # total 8 -> split limits 5/1/2, so the val split is non-empty.
    LIVECellPreprocessor(str(src), str(out), total_images=8).preprocess()
    return out


def test_train_custom_cli_end_to_end(small_split, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)

    from livecell_tpu.train.train_custom import main

    cfg = Config(model=dataclasses.replace(TINY, max_instances=32))
    state = main([
        "--data_dir", str(small_split), "--batch_size", "4",
        "--num_epochs", "1", "--lr", "0.001",
    ], config=cfg)

    assert int(state.step) > 0
    # Checkpoint + plot + JSONL-fallback artifacts written.
    assert os.path.isdir("models/custom_maskrcnn_1epochs.ckpt")
    assert os.path.exists("outputs/custom_training_plot.png")

    # Reload the checkpoint and run inference through the serve loader.
    from livecell_tpu.train import checkpoint

    ckpt = checkpoint.load("models/custom_maskrcnn_1epochs.ckpt")
    assert "params" in ckpt and "batch_stats" in ckpt
    assert ckpt["meta"]["epoch"] == 1

    import jax.numpy as jnp

    from livecell_tpu.models.mask_rcnn import CustomMaskRCNN

    model = CustomMaskRCNN(cfg.model)
    det = model.apply({"params": ckpt["params"],
                       "batch_stats": ckpt["batch_stats"]},
                      jnp.zeros((1, TINY.image_height, TINY.image_width, 3),
                                jnp.float32), train=False)
    assert det.boxes.shape[1] == TINY.max_detections


def test_tracker_jsonl_fallback(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)

    from livecell_tpu.train.tracker import Tracker

    t = Tracker(True, "proj", "run1", {"lr": 0.1})
    t.log({"epoch": 1, "train/total_loss": 2.0})
    t.update_config({"params": 5})
    t.finish()
    path = tmp_path / "outputs/runs/run1.jsonl"
    lines = [json.loads(ln) for ln in path.read_text().splitlines()]
    events = [ln["event"] for ln in lines]
    assert events == ["init", "log", "config_update"]
    assert lines[1]["train/total_loss"] == 2.0


def test_train_custom_resume(small_split, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)

    from livecell_tpu.train.train_custom import main

    cfg = Config(model=dataclasses.replace(TINY, max_instances=32))
    base = ["--data_dir", str(small_split), "--batch_size", "4",
            "--lr", "0.001"]
    main(base + ["--num_epochs", "1"], config=cfg)
    # Resume from the epoch-1 checkpoint and finish epoch 2.
    state = main(base + ["--num_epochs", "2", "--resume",
                         "models/custom_maskrcnn_1epochs.ckpt"],
                 config=cfg)
    steps_per_epoch = 50 // 4
    assert int(state.step) == 2 * steps_per_epoch
    assert os.path.isdir("models/custom_maskrcnn_2epochs.ckpt")
