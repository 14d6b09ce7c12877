"""Step-level training parity: JAX custom Mask R-CNN vs a plain-torch
transcription of the reference (tests/torch_ref/reference_model.py).

The only parity evidence obtainable without network access: identical
initial weights, identical batches, and a scenario in which every random
sampling step in the reference degenerates to "take all" (anchor count
144 <= caps, proposal count <= num_samples), so the loss dicts and the
AdamW trajectories must agree to floating-point tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import optax  # noqa: E402

from livecell_tpu.config import ModelConfig  # noqa: E402
from livecell_tpu.models.mask_rcnn import create_model  # noqa: E402
from livecell_tpu.ops.mask_ops import extract_mask_targets  # noqa: E402
from tests.torch_ref.export import export_to_torch  # noqa: E402
from tests.torch_ref.reference_model import RefMaskRCNN  # noqa: E402

pytestmark = pytest.mark.slow  # heavy integration tier (see pyproject.toml)

# 16x16 image -> 4x4 stride-4 feature map -> 144 anchors. With caps
# >= 144 every sampling site keeps everything (order-invariant losses),
# so randperm vs jax.random differences cannot matter.
CFG = ModelConfig(
    image_height=16, image_width=16, max_instances=4,
    compute_dtype="float32", roi_precision="highest",
    rpn_pos_per_image=144, rpn_batch_per_image=288,
    train_pre_topk=144, train_num_samples=144)

KEYS = ("loss_rpn_cls", "loss_box_cls", "loss_box_reg", "loss_mask")


def make_batch(seed=0, b=4, n_gt=3):
    # b=4: deep backbone stages are 1x1 spatially, so train-mode BN
    # statistics are over b values per channel; with b=2 the normalized
    # activations degenerate to +-sign(a-b) and amplify fp noise
    # chaotically. Four samples keep the variances well-conditioned.
    rng = np.random.default_rng(seed)
    images = rng.uniform(size=(b, 16, 16, 3)).astype(np.float32)
    boxes = np.zeros((b, CFG.max_instances, 4), np.float32)
    valid = np.zeros((b, CFG.max_instances), bool)
    masks = np.zeros((b, CFG.max_instances, 16, 16), np.float32)
    for bi in range(b):
        for k in range(n_gt):
            x1 = rng.uniform(0, 3); y1 = rng.uniform(0, 3)
            x2 = x1 + rng.uniform(10, 13); y2 = y1 + rng.uniform(10, 13)
            boxes[bi, k] = [x1, y1, x2, y2]
            valid[bi, k] = True
            yy, xx = np.mgrid[0:16, 0:16]
            inside = (xx >= x1) & (xx <= x2) & (yy >= y1) & (yy <= y2)
            blob = rng.uniform(size=(16, 16)) > 0.3
            masks[bi, k] = (inside & blob).astype(np.float32)
    return images, boxes, valid, masks


def jax_targets(boxes, valid, masks):
    b = boxes.shape[0]
    mask28 = np.zeros((b, CFG.max_instances, 28, 28), np.float32)
    for bi in range(b):
        mask28[bi] = np.asarray(extract_mask_targets(
            jnp.asarray(masks[bi]), jnp.asarray(boxes[bi])))
    return {"boxes": jnp.asarray(boxes),
            "labels": jnp.asarray(valid.astype(np.int32)),
            "mask28": jnp.asarray(mask28),
            "valid": jnp.asarray(valid)}


def torch_targets(boxes, valid, masks):
    out = []
    for bi in range(boxes.shape[0]):
        n = int(valid[bi].sum())
        out.append({"boxes": torch.from_numpy(boxes[bi, :n].copy()),
                    "masks": torch.from_numpy(masks[bi, :n].copy())})
    return out


def _setup():
    images, boxes, valid, masks = make_batch()
    jt = jax_targets(boxes, valid, masks)
    tt = torch_targets(boxes, valid, masks)
    images_j = jnp.asarray(images)
    images_t = torch.from_numpy(images.transpose(0, 3, 1, 2).copy())
    model, variables = create_model(CFG, jax.random.key(0))
    tmodel = RefMaskRCNN(num_samples=CFG.train_num_samples,
                         num_proposals=CFG.train_pre_topk,
                         rpn_pos_cap=CFG.rpn_pos_per_image,
                         rpn_batch=CFG.rpn_batch_per_image)
    export_to_torch(variables, tmodel)
    tmodel.train()
    return model, variables, tmodel, images_j, images_t, jt, tt


def _make_jstep(model, images_j, jt, tx):
    @jax.jit
    def jstep(params, bstats, opt_state, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bstats}, images_j, jt,
                train=True, rngs={"sampling": key},
                mutable=["batch_stats"])
            return sum(out.values()), (out, mut["batch_stats"])

        (_, (out, nbs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, nopt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), nbs, nopt, out, grads

    return jstep


def _run_both(tx_factory, topt_factory, steps):
    model, variables, tmodel, images_j, images_t, jt, tt = _setup()
    tx = tx_factory()
    params, bstats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    topt = topt_factory(tmodel)
    jstep = _make_jstep(model, images_j, jt, tx)

    history = []
    grads0 = None
    for step in range(steps):
        params, bstats, opt_state, jout, grads = jstep(
            params, bstats, opt_state, jax.random.key(step))
        if step == 0:
            grads0 = jax.tree.map(np.asarray, grads)
        jout = {k: float(v) for k, v in jout.items()}

        tout = tmodel(images_t, tt)
        topt.zero_grad()
        sum(tout.values()).backward()
        if step == 0:
            # grad=None (e.g. rpn.bbox_pred — the reference never uses
            # its deltas) corresponds to zero grads on the jax side.
            tgrads0 = {
                name: (p.grad.detach().numpy().copy()
                       if p.grad is not None
                       else np.zeros(tuple(p.shape), np.float32))
                for name, p in tmodel.named_parameters()}
        topt.step()
        history.append((step, jout,
                        {k: float(v.detach()) for k, v in tout.items()}))
    return history, grads0, tgrads0


def test_step0_losses_and_gradients_match():
    """Identical weights + batch => identical loss dict AND identical
    gradient pytree (the actual parity content; optimizer trajectories
    amplify fp noise through Adam's g/|g| normalization)."""
    from tests.torch_ref.export import _flatten, _kernel_to_torch

    with jax.default_matmul_precision("highest"):
        history, grads0, tgrads0 = _run_both(
            lambda: optax.sgd(1e-2),
            lambda m: torch.optim.SGD(m.parameters(), lr=1e-2), 1)

    _, jout, tout = history[0]
    assert set(jout) == set(KEYS)
    for k in KEYS:
        np.testing.assert_allclose(jout[k], tout[k], rtol=1e-3, atol=1e-4,
                                   err_msg=k)
    assert jout["loss_mask"] > 0.1 and jout["loss_box_reg"] > 0.0

    flat = _flatten(grads0)
    checked = 0
    for key, g in flat.items():
        tkey = key.replace("/", ".")
        if key.endswith("/kernel"):
            g = _kernel_to_torch(key, g)
            tkey = tkey[:-len("kernel")] + "weight"
        elif key.endswith("/scale"):
            tkey = tkey[:-len("scale")] + "weight"
        tg = tgrads0[tkey]
        # Normalized per-leaf comparison: every element within 1% of the
        # leaf's max-magnitude gradient (fp noise through the deep stack
        # and its BN normalizations accounts for the slack).
        scale = max(np.abs(tg).max(), 1e-6)
        np.testing.assert_allclose(g / scale, tg / scale, atol=1e-2,
                                   err_msg=f"grad mismatch: {key}")
        checked += 1
    assert checked == len(tgrads0), (checked, len(tgrads0))


def test_multi_step_sgd_parity():
    """3 SGD training steps track each other tightly (SGD keeps update
    magnitude proportional to the gradient, so fp noise stays fp-sized;
    lr is modest so discrete selection boundaries — proposal score
    threshold, fg IoU cutoffs — don't flip between implementations)."""
    with jax.default_matmul_precision("highest"):
        history, _, _ = _run_both(
            lambda: optax.sgd(5e-3),
            lambda m: torch.optim.SGD(m.parameters(), lr=5e-3), 3)
    for step, jout, tout in history:
        for k in KEYS:
            np.testing.assert_allclose(
                jout[k], tout[k], rtol=3e-3, atol=3e-4,
                err_msg=f"step {step} {k}: jax={jout[k]} torch={tout[k]}")


def test_multi_step_adamw_trajectory():
    """3 AdamW steps at the reference hyperparameters
    (train_custom.py:297-301). Adam's first updates are +-lr*sign(g), so
    weights whose gradients sit near zero can step oppositely between
    implementations; the trajectories stay close but not fp-tight."""
    with jax.default_matmul_precision("highest"):
        history, _, _ = _run_both(
            lambda: optax.adamw(1e-3, weight_decay=1e-4),
            lambda m: torch.optim.AdamW(m.parameters(), lr=1e-3,
                                        weight_decay=1e-4), 3)
    np.testing.assert_allclose(
        [history[0][1][k] for k in KEYS], [history[0][2][k] for k in KEYS],
        rtol=1e-3, atol=1e-4)
    for step, jout, tout in history[1:]:
        for k in KEYS:
            np.testing.assert_allclose(
                jout[k], tout[k], rtol=0.15, atol=0.02,
                err_msg=f"step {step} {k}: jax={jout[k]} torch={tout[k]}")
