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


class _Conv1x1Params(nn.Module):
    """Parameter holder shaped exactly like flax nn.Conv's 1x1 params
    ({kernel: [1,1,Cin,Cout], bias: [Cout]}) without owning a forward —
    the parent fuses several of these into one GEMM."""

    in_channels: int
    features: int

    def setup(self):
        self.kernel = self.param(
            "kernel", normal_std(0.01),
            (1, 1, self.in_channels, self.features), jnp.float32)
        self.bias = self.param("bias", zeros, (self.features,), jnp.float32)


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
        cls = _Conv1x1Params(self.in_channels, self.num_anchors,
                             name="cls_logits")
        box = _Conv1x1Params(self.in_channels, self.num_anchors * 4,
                             name="bbox_pred")
        # One fused [C, A+4A] GEMM instead of two lane-starved 1x1 convs
        # (C_out 9 and 36 each pad to a full 128-lane MXU tile; fusing
        # halves the small-conv passes — r3 xprof named these in the
        # lane-bound conv tail). Param tree is unchanged, so checkpoints
        # and the torch-parity export are unaffected.
        a = self.num_anchors
        wk = jnp.concatenate(
            [cls.kernel[0, 0], box.kernel[0, 0]], axis=1).astype(self.dtype)
        wb = jnp.concatenate([cls.bias, box.bias]).astype(self.dtype)

        cls_out, box_out = [], []
        for f in feats:
            t = nn.relu(conv(f))
            fused = jnp.einsum("bhwc,cf->bhwf", t, wk) + wb
            cls_out.append(fused[..., :a])
            box_out.append(fused[..., a:])
        return tuple(cls_out), tuple(box_out)
