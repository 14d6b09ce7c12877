"""Feature Pyramid Network (reference components/fpn.py:5-55), NHWC.

1x1 laterals, nearest-neighbor top-down upsample-and-add, 3x3+ReLU output
convs; kaiming_uniform(a=1) init with zero biases, matching the
reference's explicit init loop (fpn.py:32-36).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from livecell_tpu.models.init import kaiming_uniform_a1, zeros


def nearest_upsample_to(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """F.interpolate(mode='nearest', size=out_hw): src index = floor(i*S/D)."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    ih = (jnp.arange(oh) * h) // oh
    iw = (jnp.arange(ow) * w) // ow
    return x[:, ih][:, :, iw]


class FPN(nn.Module):
    """The reference's FPN uses ReLU after the 3x3 output convs
    (fpn.py:22-30); torchvision's detection FPN does not and appends a
    stride-2 maxpool level (P6) for the RPN — both variants are supported
    for the custom and transfer models respectively."""

    in_channels: Sequence[int] = (64, 128, 256, 512)
    out_channels: int = 256
    relu_outputs: bool = True
    extra_maxpool: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), kernel_init=kaiming_uniform_a1,
                    bias_init=zeros, dtype=self.dtype,
                    name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = nearest_upsample_to(laterals[i], laterals[i - 1].shape[1:3])
            laterals[i - 1] = laterals[i - 1] + up

        outs = []
        for i, lat in enumerate(laterals):
            o = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=kaiming_uniform_a1, bias_init=zeros,
                        dtype=self.dtype, name=f"output{i}")(lat)
            outs.append(nn.relu(o) if self.relu_outputs else o)
        if self.extra_maxpool:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
