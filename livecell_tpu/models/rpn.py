"""RPN head (reference components/rpn.py:16-40), NHWC.

Shared 3x3 conv + ReLU, then 1x1 objectness (A channels) and 1x1 box
deltas (4A channels) per pyramid level. Head init: normal std 0.01 with
zero bias for the predictors (rpn.py:27-29); shared conv keeps the torch
default.

Outputs stay NHWC: cls [B,H,W,A], deltas [B,H,W,4A]. Flattening
[H,W,A] row-major reproduces the reference's permute(0,2,3,1).reshape(-1)
anchor ordering (rpn.py:53, proposal_utils.py:16).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from livecell_tpu.models.init import (
    normal_std, torch_default_bias, torch_default_kernel, zeros)


class RPNHead(nn.Module):
    in_channels: int = 256
    num_anchors: int = 9
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]
                 ) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
        conv = nn.Conv(self.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                       kernel_init=torch_default_kernel,
                       bias_init=torch_default_bias(self.in_channels * 9),
                       dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), kernel_init=normal_std(0.01),
                      bias_init=zeros, dtype=self.dtype, name="cls_logits")
        box = nn.Conv(self.num_anchors * 4, (1, 1),
                      kernel_init=normal_std(0.01), bias_init=zeros,
                      dtype=self.dtype, name="bbox_pred")

        cls_out, box_out = [], []
        for f in feats:
            t = nn.relu(conv(f))
            cls_out.append(cls(t))
            box_out.append(box(t))
        return tuple(cls_out), tuple(box_out)
