"""StemConvS2D equivalence: the space-to-depth stem must compute the
identical convolution as the plain 7x7/2 stem (models/resnet.py) with
an unchanged parameter tree, so checkpoints and the torch importer are
oblivious to the flag."""

import jax
import jax.numpy as jnp
import pytest

from livecell_tpu.models.resnet import ResNetBackbone


@pytest.fixture(scope="module")
def backbones():
    plain = ResNetBackbone(dtype=jnp.float32)
    s2d = ResNetBackbone(dtype=jnp.float32, stem_s2d=True)
    rng = jax.random.key(0)
    x = jax.random.uniform(rng, (2, 222, 300, 3), jnp.float32)
    v = plain.init(rng, x, train=False)
    return plain, s2d, v


def test_param_tree_identical(backbones):
    plain, s2d, v = backbones
    rng = jax.random.key(1)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v2 = s2d.init(rng, x, train=False)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v2)
    assert v["params"]["conv1"]["kernel"].shape == \
        v2["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)


@pytest.mark.parametrize("shape", [(2, 222, 300, 3), (1, 101, 75, 3)])
def test_s2d_matches_plain_stem(backbones, shape):
    plain, s2d, v = backbones
    x = jax.random.uniform(jax.random.key(2), shape, jnp.float32)
    with jax.default_matmul_precision("highest"):
        a = plain.apply(v, x, train=False)
        b = s2d.apply(v, x, train=False)
    for fa, fb in zip(a, b):
        assert fa.shape == fb.shape
        rel = float(jnp.abs(fa - fb).max()) / \
            (float(jnp.abs(fa).max()) + 1e-9)
        # f32 conv on this backend still reassociates; gate well below
        # any semantic difference.
        assert rel < 1e-5, rel


def test_s2d_gradients_flow(backbones):
    plain, s2d, v = backbones
    x = jax.random.uniform(jax.random.key(3), (1, 64, 96, 3), jnp.float32)

    def loss(variables, mdl):
        return sum(jnp.sum(f.astype(jnp.float32) ** 2)
                   for f in mdl.apply(variables, x, train=False))

    with jax.default_matmul_precision("highest"):
        ga = jax.grad(loss)(v, plain)["params"]["conv1"]["kernel"]
        gb = jax.grad(loss)(v, s2d)["params"]["conv1"]["kernel"]
    rel = float(jnp.abs(ga - gb).max()) / (float(jnp.abs(ga).max()) + 1e-9)
    assert rel < 1e-4, rel
