"""Transfer Mask R-CNN (R50-FPN) shape/loss tests at a reduced scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livecell_tpu.models.transfer import (
    TransferConfig, create_transfer_model)

TINY = TransferConfig(
    tile_height=64, tile_width=96,
    image_height=128, image_width=192, resized_width=192,
    rpn_pre_topk_per_level=32, rpn_post_nms=32,
    box_batch=32, mask_slots=8, max_detections=8, max_instances=8,
    rpn_batch=32)


@pytest.fixture(scope="module")
def tmodel():
    return create_transfer_model(rng=jax.random.key(0), cfg=TINY)


def synthetic(b=1, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.uniform(size=(b, TINY.tile_height, TINY.tile_width, 3)
                         ).astype(np.float32)
    i = TINY.max_instances
    boxes = np.zeros((b, i, 4), np.float32)
    valid = np.zeros((b, i), bool)
    for bi in range(b):
        for k in range(3):
            x1 = rng.uniform(0, 60); y1 = rng.uniform(0, 30)
            boxes[bi, k] = [x1, y1, x1 + rng.uniform(10, 30),
                            y1 + rng.uniform(10, 25)]
            valid[bi, k] = True
    return (jnp.asarray(images), {
        "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(valid.astype(np.int32)),
        "mask28": jnp.asarray(
            (rng.uniform(size=(b, i, 28, 28)) > 0.5).astype(np.float32)),
        "valid": jnp.asarray(valid)})


def test_transfer_param_tree(tmodel):
    _, variables = tmodel
    p = variables["params"]
    assert "backbone" in p and "fpn" in p and "rpn" in p
    assert p["box_head"]["fc6"]["kernel"].shape == (7 * 7 * 256, 1024)
    assert p["box_predictor"]["cls_score"]["kernel"].shape == (1024, 2)
    # R50 bottleneck blocks present
    assert "layer3_5" in p["backbone"]


@pytest.mark.slow
def test_transfer_train_losses(tmodel):
    model, variables = tmodel
    images, targets = synthetic()
    losses = model.apply(variables, images, targets, train=True,
                         rngs={"sampling": jax.random.key(1)})
    assert set(losses) == {"loss_objectness", "loss_rpn_box_reg",
                           "loss_classifier", "loss_box_reg", "loss_mask"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_transfer_inference_shapes(tmodel):
    model, variables = tmodel
    images, _ = synthetic()
    det = model.apply(variables, images, train=False)
    d = TINY.max_detections
    assert det.boxes.shape == (1, d, 4)
    assert det.mask_probs.shape == (1, d, 28, 28)
    # Boxes come back in tile coordinates.
    b = np.asarray(det.boxes)[np.asarray(det.valid)]
    if len(b):
        assert (b[:, 2] <= TINY.tile_width + 1e-3).all()
        assert (b[:, 3] <= TINY.tile_height + 1e-3).all()


def test_torch_import_roundtrip(tmp_path, tmodel):
    """Export a fake torchvision-style state_dict and import it."""
    torch = pytest.importorskip("torch")

    from livecell_tpu.models.torch_import import (
        jax_tree_to_dict, load_torchvision_weights)

    model, variables = tmodel
    flat = jax_tree_to_dict(variables["params"])

    sd = {}

    def put(name, arr):
        sd[name] = torch.from_numpy(np.asarray(arr, np.float32))

    # Build a consistent fake state_dict from our own shapes.
    put("backbone.body.conv1.weight",
        np.transpose(flat["backbone/conv1/kernel"], (3, 2, 0, 1)) + 1.0)
    put("backbone.body.bn1.weight", flat["backbone/bn1/scale"] + 1.0)
    put("backbone.body.bn1.bias", flat["backbone/bn1/bias"])
    put("backbone.body.bn1.running_mean",
        np.zeros_like(flat["backbone/bn1/bias"]))
    put("backbone.body.bn1.running_var",
        np.ones_like(flat["backbone/bn1/bias"]))
    put("roi_heads.box_head.fc6.weight", np.zeros((1024, 12544)) + 0.5)
    put("roi_heads.box_head.fc6.bias", np.zeros(1024))
    put("roi_heads.box_head.fc7.weight", np.zeros((1024, 1024)) + 0.25)
    put("roi_heads.box_head.fc7.bias", np.zeros(1024))
    put("rpn.head.cls_logits.weight",
        np.transpose(flat["rpn/cls_logits/kernel"], (3, 2, 0, 1)) + 2.0)
    put("rpn.head.cls_logits.bias", flat["rpn/cls_logits/bias"])
    put("rpn.head.bbox_pred.weight",
        np.transpose(flat["rpn/bbox_pred/kernel"], (3, 2, 0, 1)))
    put("rpn.head.bbox_pred.bias", flat["rpn/bbox_pred/bias"])

    path = tmp_path / "fake.pth"
    torch.save(sd, path)

    out = load_torchvision_weights(variables, str(path))
    new_flat = jax_tree_to_dict(out["params"])
    np.testing.assert_allclose(
        new_flat["backbone/conv1/kernel"],
        flat["backbone/conv1/kernel"] + 1.0, rtol=1e-6)
    np.testing.assert_allclose(
        new_flat["box_head/fc6/kernel"], 0.5, rtol=1e-6)
    np.testing.assert_allclose(
        new_flat["rpn/cls_logits/kernel"],
        flat["rpn/cls_logits/kernel"] + 2.0, rtol=1e-6)
    # Untouched keys stay intact.
    np.testing.assert_allclose(new_flat["box_predictor/cls_score/kernel"],
                               flat["box_predictor/cls_score/kernel"])


def test_deconv_import_matches_torch():
    """Golden: a torch ConvTranspose2d weight imported through _deconv
    must reproduce torch's deconv output in flax (requires the spatial
    flip — transpose alone is numerically wrong)."""
    torch = pytest.importorskip("torch")
    from flax import linen as nn

    from livecell_tpu.models.torch_import import _deconv

    g = torch.Generator().manual_seed(0)
    tdeconv = torch.nn.ConvTranspose2d(3, 5, kernel_size=2, stride=2)
    with torch.no_grad():
        tdeconv.weight.copy_(torch.randn(3, 5, 2, 2, generator=g))
        tdeconv.bias.copy_(torch.randn(5, generator=g))
    x = torch.randn(2, 3, 7, 7, generator=g)
    with torch.no_grad():
        ref = tdeconv(x).numpy()  # [2, 5, 14, 14]

    fdeconv = nn.ConvTranspose(5, (2, 2), strides=(2, 2),
                               dtype=jnp.float32)
    variables = {"params": {
        "kernel": jnp.asarray(_deconv(tdeconv.weight.detach().numpy())),
        "bias": jnp.asarray(tdeconv.bias.detach().numpy())}}
    out = fdeconv.apply(variables, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)))  # NCHW -> NHWC
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref, rtol=1e-4, atol=1e-5)


def test_torchvision_import_full_state_dict(tmp_path, tmodel):
    """A shape-complete fake torchvision maskrcnn_resnet50_fpn checkpoint
    (91 classes like the real pretrained one) must import with ZERO
    unconsumed tensors (strict), and the model must run inference on the
    imported weights."""
    torch = pytest.importorskip("torch")

    from livecell_tpu.models.torch_import import (
        jax_tree_to_dict, load_torchvision_weights)
    from tests.util_torchvision_fake import (
        fake_torchvision_maskrcnn_state_dict)

    model, variables = tmodel
    sd = fake_torchvision_maskrcnn_state_dict(num_classes=91)
    path = tmp_path / "full_fake.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)

    out = load_torchvision_weights(variables, str(path), strict=True)

    # Every mappable param actually changed (91-class predictors excluded
    # by design: the reference swaps them, train_transfer.py:22-35).
    old = jax_tree_to_dict(variables["params"])
    new = jax_tree_to_dict(out["params"])
    unchanged = [k for k in old
                 if not k.startswith(("box_predictor/",
                                      "mask_head/mask_fcn_logits/"))
                 and np.allclose(old[k], new[k])]
    assert not unchanged, f"params not imported: {unchanged[:10]}"
    old_stats = jax_tree_to_dict(variables.get("batch_stats", {}))
    new_stats = jax_tree_to_dict(out.get("batch_stats", {}))
    stat_unchanged = [k for k in old_stats
                      if np.allclose(old_stats[k], new_stats[k])]
    assert not stat_unchanged, f"stats not imported: {stat_unchanged[:10]}"

    images, _ = synthetic()
    out = jax.tree.map(jnp.asarray, out)
    det = model.apply(out, images, train=False)
    assert np.isfinite(np.asarray(det.scores)).all()


def test_rpn_targets_pallas_matches_xla():
    """_rpn_targets_from_match (fused Pallas matcher outputs) produces
    the same fg/bg sampling pool and regression targets as the dense
    XLA _rpn_targets for untied >1px data."""
    from livecell_tpu.models.transfer import (
        _rpn_targets, _rpn_targets_from_match)
    from livecell_tpu.ops.pallas_match import match_anchors_pallas

    rng = np.random.default_rng(3)
    a = 512
    anchors = np.zeros((a, 4), np.float32)
    x1 = rng.uniform(0, 150, a); y1 = rng.uniform(0, 90, a)
    anchors[:, 0], anchors[:, 1] = x1, y1
    anchors[:, 2] = x1 + rng.uniform(8, 40, a)
    anchors[:, 3] = y1 + rng.uniform(8, 40, a)
    i = 8
    gtb = np.zeros((1, i, 4), np.float32)
    gtv = np.zeros((1, i), bool)
    for k in range(5):
        gx, gy = rng.uniform(0, 140), rng.uniform(0, 80)
        gtb[0, k] = [gx, gy, gx + rng.uniform(6, 35),
                     gy + rng.uniform(6, 35)]
        gtv[0, k] = True

    cfg = TINY
    key = jax.random.key(5)
    anchors_j = jnp.asarray(anchors)
    mx, tgt, best = match_anchors_pallas(
        anchors_j, jnp.asarray(gtb), jnp.asarray(gtv), full=True,
        interpret=True)

    rows_x, rval_x, lab_x, fi_x, fv_x, reg_x = _rpn_targets(
        cfg, anchors_j, jnp.asarray(gtb[0]), jnp.asarray(gtv[0]), key)
    rows_p, rval_p, lab_p, fi_p, fv_p, reg_p = _rpn_targets_from_match(
        cfg, anchors_j, mx[0], tgt[0], best[0],
        jnp.asarray(gtb[0]), jnp.asarray(gtv[0]), key)

    # Same PRNG + same fg/bg pools => identical sampling.
    np.testing.assert_array_equal(np.asarray(rows_x), np.asarray(rows_p))
    np.testing.assert_array_equal(np.asarray(rval_x), np.asarray(rval_p))
    np.testing.assert_array_equal(np.asarray(lab_x), np.asarray(lab_p))
    np.testing.assert_allclose(np.asarray(reg_x), np.asarray(reg_p),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_transfer_losses_roi_backend_parity(tmodel, monkeypatch):
    """train_forward losses agree between the XLA gather align and the
    fused Pallas multiscale align (interpret mode)."""
    import dataclasses

    import livecell_tpu.ops.pallas_ms_roi as pms

    model, variables = tmodel
    images, targets = synthetic()
    base = model.apply(variables, images, targets, train=True,
                       rngs={"sampling": jax.random.key(1)})

    orig = pms.ms_roi_align_pallas
    monkeypatch.setattr(
        pms, "ms_roi_align_pallas",
        lambda feats, boxes, out_size=7, ratio=2: orig(
            feats, boxes, out_size, ratio, True))
    from livecell_tpu.models.transfer import TransferMaskRCNN
    pmodel = TransferMaskRCNN(dataclasses.replace(
        TINY, roi_backend="pallas"))
    got = pmodel.apply(variables, images, targets, train=True,
                       rngs={"sampling": jax.random.key(1)})
    for k in base:
        np.testing.assert_allclose(float(got[k]), float(base[k]),
                                   rtol=5e-2, atol=5e-2), k
