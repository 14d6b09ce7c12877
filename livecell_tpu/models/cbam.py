"""CBAM attention (Woo et al., arXiv:1807.06521), NHWC.

Mirrors the reference module semantics (components/cbam.py:7-65):
channel attention = sigmoid(MLP(avgpool) + MLP(maxpool)) gate with a
shared 2-layer bottleneck MLP (no biases, reduction 16), followed by
spatial attention = sigmoid(conv7x7([mean_c, max_c])) gate (no bias).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from livecell_tpu.models.init import torch_default_kernel


class ChannelAttention(nn.Module):
    channels: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hidden = self.channels // self.reduction
        fc1 = nn.Dense(hidden, use_bias=False, dtype=self.dtype,
                       kernel_init=torch_default_kernel, name="fc1")
        fc2 = nn.Dense(self.channels, use_bias=False, dtype=self.dtype,
                       kernel_init=torch_default_kernel, name="fc2")

        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        y = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        gate = nn.sigmoid(y)[:, None, None, :]
        return x * gate


class SpatialAttention(nn.Module):
    kernel_size: int = 7
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], axis=-1)
        pad = self.kernel_size // 2
        gate = nn.Conv(1, (self.kernel_size, self.kernel_size),
                       padding=((pad, pad), (pad, pad)), use_bias=False,
                       kernel_init=torch_default_kernel, dtype=self.dtype,
                       name="conv")(y)
        return x * nn.sigmoid(gate)


class CBAM(nn.Module):
    channels: int
    reduction: int = 16
    kernel_size: int = 7
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = ChannelAttention(self.channels, self.reduction, self.dtype,
                             name="channel")(x)
        x = SpatialAttention(self.kernel_size, self.dtype, name="spatial")(x)
        return x
