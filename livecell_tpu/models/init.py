"""Parameter initializers reproducing the torch schemes the reference uses.

The reference relies on a mix of torch defaults and explicit inits
(custom_maskrcnn.py:29, fpn.py:32-36, rpn.py:27-29, box_head.py:21-24,
mask_head.py:35-39). Matching them keeps from-scratch training dynamics
comparable. All are expressible as flax variance_scaling / normal.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import random

# torch nn.Conv2d / nn.Linear default: kaiming_uniform(a=sqrt(5)) ==
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
torch_default_kernel = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")

# nn.init.kaiming_uniform_(w, a=1): gain^2 = 2/(1+1) = 1 (FPN convs).
kaiming_uniform_a1 = nn.initializers.variance_scaling(
    1.0, "fan_in", "uniform")

# nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu') (ResNet,
# mask head).
kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal")


def normal_std(std: float):
    return nn.initializers.normal(stddev=std)


def torch_default_bias(fan_in: int):
    """torch Conv2d/Linear default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


zeros = nn.initializers.zeros
