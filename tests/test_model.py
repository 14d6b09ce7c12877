"""End-to-end model tests: init, loss computation, gradients, inference."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livecell_tpu.config import ModelConfig
from livecell_tpu.models.mask_rcnn import (
    CustomMaskRCNN, count_parameters, create_model)

TINY = ModelConfig(
    image_height=64, image_width=96, max_instances=8,
    train_pre_topk=64, train_num_samples=16,
    infer_pre_topk=32, infer_post_nms=8, max_detections=8,
    rpn_pos_per_image=16, rpn_batch_per_image=32,
)


def synthetic_batch(cfg, b=2, n_inst=3, seed=0):
    rng = np.random.default_rng(seed)
    h, w = cfg.image_height, cfg.image_width
    images = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
    i = cfg.max_instances
    boxes = np.zeros((b, i, 4), np.float32)
    mask28 = np.zeros((b, i, 28, 28), np.float32)
    valid = np.zeros((b, i), bool)
    for bi in range(b):
        for k in range(n_inst):
            x1 = rng.uniform(0, w - 30); y1 = rng.uniform(0, h - 30)
            bw = rng.uniform(15, 28); bh = rng.uniform(15, 28)
            boxes[bi, k] = [x1, y1, min(x1 + bw, w), min(y1 + bh, h)]
            mask28[bi, k, 6:22, 6:22] = 1.0
            valid[bi, k] = True
    labels = valid.astype(np.int32)
    return (jnp.asarray(images),
            {"boxes": jnp.asarray(boxes), "labels": jnp.asarray(labels),
             "mask28": jnp.asarray(mask28), "valid": jnp.asarray(valid)})


@pytest.fixture(scope="module")
def model_and_vars():
    return create_model(TINY, jax.random.key(0))


def test_init_param_counts(model_and_vars):
    _, variables = model_and_vars
    info = count_parameters(variables["params"])
    # ResNet-18 backbone alone is ~11.2M params.
    assert 10_000_000 < info["backbone"] < 12_500_000
    assert info["cbam"] > 0 and info["fpn"] > 0 and info["rpn"] > 0
    assert info["box_head"] > 12_544 * 1024
    assert info["total"] == (info["backbone"] + info["custom"])


def test_train_forward_losses(model_and_vars):
    model, variables = model_and_vars
    images, targets = synthetic_batch(TINY)
    losses, mutated = model.apply(
        variables, images, targets, train=True,
        rngs={"sampling": jax.random.key(1)}, mutable=["batch_stats"])
    assert set(losses) == {"loss_rpn_cls", "loss_box_cls", "loss_box_reg",
                           "loss_mask"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
        assert float(v) >= 0, k
    assert "batch_stats" in mutated


def test_train_forward_no_gt(model_and_vars):
    model, variables = model_and_vars
    images, targets = synthetic_batch(TINY)
    targets = dict(targets, valid=jnp.zeros_like(targets["valid"]))
    losses, _ = model.apply(
        variables, images, targets, train=True,
        rngs={"sampling": jax.random.key(1)}, mutable=["batch_stats"])
    # Reference fallback: rpn loss constant 0.1, heads 0 (rpn.py:64,
    # custom_maskrcnn.py:215-219).
    assert float(losses["loss_rpn_cls"]) == pytest.approx(0.1)
    assert float(losses["loss_box_reg"]) == 0.0
    assert float(losses["loss_mask"]) == 0.0


@pytest.mark.slow
def test_gradients_flow(model_and_vars):
    model, variables = model_and_vars
    images, targets = synthetic_batch(TINY)

    def loss_fn(params):
        losses, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, targets, train=True,
            rngs={"sampling": jax.random.key(2)}, mutable=["batch_stats"])
        return sum(losses.values())

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    total_norm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                                    for g in leaves)))
    assert total_norm > 0


def test_inference_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    images, _ = synthetic_batch(TINY)
    det = model.apply(variables, images, train=False)
    b, d = 2, TINY.max_detections
    assert det.boxes.shape == (b, d, 4)
    assert det.scores.shape == (b, d)
    assert det.mask_probs.shape == (b, d, 28, 28)
    assert det.valid.dtype == bool
    # Untrained net: whatever is valid must obey thresholds.
    v = np.asarray(det.valid)
    s = np.asarray(det.scores)
    assert (s[v] > TINY.det_score_thresh).all() if v.any() else True


def test_inference_jit_static(model_and_vars):
    model, variables = model_and_vars
    images, _ = synthetic_batch(TINY)

    @jax.jit
    def infer(imgs):
        return model.apply(variables, imgs, train=False)

    d1 = infer(images)
    d2 = infer(images + 0.01)
    assert d1.boxes.shape == d2.boxes.shape


@pytest.mark.slow
def test_train_forward_heads_all_images():
    """Fixed mode: every image supervises RPN + heads (quirk-fix flag)."""
    import dataclasses

    cfg = dataclasses.replace(TINY, heads_all_images=True)
    model, variables = create_model(cfg, jax.random.key(0))
    images, targets = synthetic_batch(cfg)
    losses, _ = model.apply(
        variables, images, targets, train=True,
        rngs={"sampling": jax.random.key(1)}, mutable=["batch_stats"])
    assert set(losses) == {"loss_rpn_cls", "loss_box_cls", "loss_box_reg",
                           "loss_mask"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, targets, train=True,
            rngs={"sampling": jax.random.key(2)}, mutable=["batch_stats"])
        return sum(out.values())

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


@pytest.mark.slow
def test_train_and_infer_decode_proposals():
    """Fixed mode with decoded RPN/box deltas (quirk-fix flag pair)."""
    cfg = dataclasses.replace(TINY, heads_all_images=True,
                              decode_proposals=True)
    model, variables = create_model(cfg, jax.random.key(0))
    images, targets = synthetic_batch(cfg)
    losses, _ = model.apply(
        variables, images, targets, train=True,
        rngs={"sampling": jax.random.key(1)}, mutable=["batch_stats"])
    assert "loss_rpn_reg" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    det = model.apply(variables, images, train=False)
    assert det.boxes.shape == (2, cfg.max_detections, 4)
    b = np.asarray(det.boxes)
    assert np.isfinite(b).all()
    # Refined boxes stay clipped to the image.
    assert (b[..., 0::2] >= 0).all() and \
        (b[..., 0::2] <= cfg.image_width).all()


def test_weighted_box_coding_roundtrip():
    """Weighted encode in match_head_targets inverts through the
    inference-side decode: decode(targets / w, proposals) == GT."""
    from livecell_tpu.models import detector
    from livecell_tpu.ops.boxes import decode_boxes

    cfg = dataclasses.replace(TINY, decode_proposals=True)
    rng = np.random.default_rng(3)
    gt = np.array([[10, 10, 40, 34], [50, 20, 80, 52]], np.float32)
    gtb = np.zeros((cfg.max_instances, 4), np.float32)
    gtb[:2] = gt
    gtv = np.zeros(cfg.max_instances, bool); gtv[:2] = True
    props = jnp.asarray(gt + rng.uniform(-3, 3, gt.shape).astype(np.float32))
    t = detector.match_head_targets(
        props, jnp.ones(2, bool), jnp.asarray(gtb), jnp.asarray(gtv),
        jnp.zeros((cfg.max_instances, 28, 28), jnp.float32), cfg)
    w = jnp.asarray(cfg.box_reg_weights, jnp.float32)
    back = np.asarray(decode_boxes(t.reg_targets / w, props))
    np.testing.assert_allclose(back, gt, atol=1e-3)
    # Targets really are scaled: compare against unweighted cfg.
    t0 = detector.match_head_targets(
        props, jnp.ones(2, bool), jnp.asarray(gtb), jnp.asarray(gtv),
        jnp.zeros((cfg.max_instances, 28, 28), jnp.float32), TINY)
    np.testing.assert_allclose(np.asarray(t.reg_targets),
                               np.asarray(t0.reg_targets) * np.asarray(w),
                               rtol=1e-5)


def test_rpn_reg_loss_forces_best_anchor():
    """A GT whose best anchor IoU is below rpn_pos_iou still gets delta
    supervision when rpn_force_best_anchor is set."""
    from livecell_tpu.models import detector

    cfg = dataclasses.replace(TINY, decode_proposals=True)
    # One anchor at 0.45 IoU with the single GT (below the 0.5 gate).
    anchors = jnp.asarray([[0., 0., 20., 20.], [100., 100., 130., 130.]])
    gt = jnp.asarray([[0., 0., 20., 9.]])        # IoU 0.45 with anchor 0
    gtv = jnp.asarray([True])
    deltas = jnp.ones((2, 4), jnp.float32)       # wrong deltas -> loss > 0

    loss = detector.rpn_reg_loss(deltas, anchors, gt, gtv, cfg)
    assert float(loss) > 0.0

    off = dataclasses.replace(cfg, rpn_force_best_anchor=False)
    loss_off = detector.rpn_reg_loss(deltas, anchors, gt, gtv, off)
    assert float(loss_off) == 0.0


@pytest.mark.slow
def test_mask_train_subset_loss_identical():
    """With mask_train_samples >= the per-image fg count, the fg-subset
    mask path computes the exact same loss dict as running the mask head
    on every sampled proposal."""
    cfg_full = dataclasses.replace(TINY, heads_all_images=True,
                                   decode_proposals=True)
    cfg_sub = dataclasses.replace(cfg_full, mask_train_samples=8)
    images, targets = synthetic_batch(cfg_full, b=2, n_inst=3)

    model_full, variables = create_model(cfg_full, jax.random.key(0))
    model_sub = CustomMaskRCNN(cfg_sub)

    def losses(model):
        out, _ = model.apply(
            variables, images, targets,
            rngs={"sampling": jax.random.key(4)},
            mutable=["batch_stats"], method=model.train_forward)
        return jax.tree.map(float, out)

    lf = losses(model_full)
    ls = losses(model_sub)
    assert set(lf) == set(ls)
    for k in lf:
        np.testing.assert_allclose(ls[k], lf[k], rtol=1e-6, err_msg=k)


def test_frozen_bn_keeps_running_stats():
    """frozen_bn=True: train-mode forward normalizes with running
    statistics and never updates them (torchvision FrozenBatchNorm2d
    semantics, reference train_transfer.py:22); losses stay finite."""
    cfg = dataclasses.replace(TINY, frozen_bn=True)
    model, variables = create_model(cfg, jax.random.key(0))
    images, targets = synthetic_batch(cfg)

    out, mut = model.apply(
        variables, images, targets,
        rngs={"sampling": jax.random.key(4)},
        mutable=["batch_stats"], method=model.train_forward)
    for a, b in zip(jax.tree.leaves(variables["batch_stats"]),
                    jax.tree.leaves(mut["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all(np.isfinite(float(v)) for v in out.values())

    # Unfrozen control: the same forward must move the statistics.
    model_u, variables_u = create_model(TINY, jax.random.key(0))
    _, mut_u = model_u.apply(
        variables_u, images, targets,
        rngs={"sampling": jax.random.key(4)},
        mutable=["batch_stats"], method=model_u.train_forward)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(variables_u["batch_stats"]),
                        jax.tree.leaves(mut_u["batch_stats"])))
    assert changed
