"""Model-config persistence: checkpoints carry the exact training-time
ModelConfig (anchor geometry, budgets, quirk switches) so eval/serve
reconstruct the model with no CLI flags.

The reference has no analog (its hyperparameters are hard-coded at call
sites, SURVEY.md §5 config row); this guards the round-4 dense-scene
training knobs (--anchor_sizes/--train_topk/... in train_custom).
"""

import dataclasses

import numpy as np

from livecell_tpu.config import (Config, ModelConfig, apply_dense_flags,
                                 apply_train_shape_flags,
                                 model_config_from_dict,
                                 model_config_to_dict)


def test_model_config_dict_roundtrip():
    m = ModelConfig(anchor_sizes=(12, 24, 48), anchor_ratios=(0.5, 1.0),
                    train_pre_topk=1000, heads_all_images=True,
                    decode_proposals=True, mask_train_samples=64)
    d = model_config_to_dict(m)
    assert d["anchor_sizes"] == [12, 24, 48]
    assert model_config_from_dict(d) == m


def test_model_config_from_dict_ignores_unknown_keys():
    d = model_config_to_dict(ModelConfig())
    d["some_future_field"] = 7
    assert model_config_from_dict(d) == ModelConfig()


def test_apply_train_shape_flags():
    class A:
        anchor_sizes = "12,24,48"
        anchor_ratios = None
        train_topk = 800
        train_samples = 256
        rpn_batch = 512
        rpn_pos = 256

    m = apply_train_shape_flags(ModelConfig(), A())
    assert m.anchor_sizes == (12, 24, 48)
    assert m.train_pre_topk == 800
    assert m.train_num_samples == 256
    assert m.rpn_batch_per_image == 512
    assert m.rpn_pos_per_image == 256
    # Anchor count scales with the new geometry.
    assert m.num_anchors_per_cell == 9


def test_checkpoint_sidecar_roundtrip(tmp_path):
    from livecell_tpu.train import checkpoint

    mc = model_config_to_dict(ModelConfig(anchor_sizes=(8, 16, 32)))
    p = str(tmp_path / "m.ckpt")
    checkpoint.save(p, {"w": np.full((2, 2), 3.0)}, {}, model_config=mc)
    out = checkpoint.load(p)
    assert out["model_config"]["anchor_sizes"] == [8, 16, 32]
    np.testing.assert_allclose(out["params"]["w"], 3.0)


def test_load_model_merges_stored_config(tmp_path):
    """load_model uses the stored config as base and overlays only the
    caller's explicit non-default changes (dense caps)."""
    import jax

    from livecell_tpu.models.mask_rcnn import create_model
    from livecell_tpu.serve.visualize import load_model
    from livecell_tpu.train import checkpoint

    trained = dataclasses.replace(
        ModelConfig(), anchor_sizes=(8, 16, 32), decode_proposals=True,
        heads_all_images=True)
    _, variables = create_model(trained, jax.random.key(0))
    p = str(tmp_path / "m.ckpt")
    checkpoint.save(p, variables["params"], variables["batch_stats"],
                    model_config=model_config_to_dict(trained))

    lifted = apply_dense_flags(Config().model, dets=256, infer_nms=0.7,
                               det_nms=0.6)
    model, _ = load_model(p, "custom", mcfg=lifted)
    c = model.cfg
    assert c.anchor_sizes == (8, 16, 32)          # from the checkpoint
    assert c.decode_proposals and c.heads_all_images
    assert c.max_detections == 256                # caller's dense caps
    assert c.infer_nms_thresh == 0.7
