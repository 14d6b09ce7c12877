"""Analytic jaxpr FLOP counter (livecell_tpu/utils/flops.py)."""

import jax
import jax.numpy as jnp

from livecell_tpu.utils.flops import count_flops


def test_matmul_flops():
    f = count_flops(lambda a, b: a @ b, jnp.ones((8, 16)), jnp.ones((16, 4)))
    assert f == 2 * 8 * 16 * 4


def test_conv_flops():
    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    f = count_flops(conv, jnp.ones((2, 10, 10, 5)), jnp.ones((3, 3, 5, 7)))
    assert f == 2 * (2 * 10 * 10 * 7) * (3 * 3 * 5)


def test_grad_counts_backward():
    def loss(w, x):
        return ((x @ w) ** 2).sum()

    w, x = jnp.ones((16, 4)), jnp.ones((8, 16))
    f_fwd = count_flops(loss, w, x)
    f_grad = count_flops(jax.grad(loss), w, x)
    assert f_fwd == 2 * 8 * 16 * 4
    # d/dw needs x^T @ g (same size GEMM); the full vjp adds more.
    assert f_grad >= 2 * f_fwd


def test_nested_jit_counted():
    inner = jax.jit(lambda a, b: a @ b)

    def outer(a, b):
        return inner(a, b).sum()

    f = count_flops(outer, jnp.ones((8, 16)), jnp.ones((16, 4)))
    assert f == 2 * 8 * 16 * 4
