"""Box and mask heads (reference components/box_head.py, mask_head.py), NHWC.

BoxHead: flatten 7x7x256 ROI features -> FC 1024 -> FC 1024 ->
(cls_score [num_classes], bbox_pred [4*num_classes]); predictor init
normal std 0.01 / 0.001 with zero bias (box_head.py:21-24). The flatten
order is NHWC-native (y, x, c) rather than torch's (c, y, x); the
torchvision weight importer permutes fc1 accordingly.

MaskHead: 4x (3x3 conv 256 + ReLU) -> 2x2/2 transposed conv (7->14) +
ReLU -> 1x1 logits -> fixed bilinear resize 14->28 (the reference's
deconv only reaches 14, then interpolates, mask_head.py:52-58). All
convs kaiming_normal(fan_out, relu) with zero bias (mask_head.py:35-39).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from livecell_tpu.models.init import (
    kaiming_normal_fan_out, normal_std, torch_default_bias,
    torch_default_kernel, zeros)
from livecell_tpu.ops.mask_ops import resize_bilinear


class BoxHead(nn.Module):
    in_channels: int = 256
    num_classes: int = 2
    roi_size: int = 7
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """roi_feats: [K, 7, 7, C] -> (cls_logits [K,nc], deltas [K,4nc])."""
        k = roi_feats.shape[0]
        fan_in = self.in_channels * self.roi_size * self.roi_size
        x = roi_feats.reshape(k, fan_in).astype(self.dtype)
        x = nn.relu(nn.Dense(1024, kernel_init=torch_default_kernel,
                             bias_init=torch_default_bias(fan_in),
                             dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(1024, kernel_init=torch_default_kernel,
                             bias_init=torch_default_bias(1024),
                             dtype=self.dtype, name="fc2")(x))
        cls = nn.Dense(self.num_classes, kernel_init=normal_std(0.01),
                       bias_init=zeros, dtype=self.dtype, name="cls_score")(x)
        box = nn.Dense(self.num_classes * 4, kernel_init=normal_std(0.001),
                       bias_init=zeros, dtype=self.dtype, name="bbox_pred")(x)
        return cls.astype(jnp.float32), box.astype(jnp.float32)


class MaskHead(nn.Module):
    in_channels: int = 256
    num_classes: int = 2
    mask_size: int = 28
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        """roi_feats: [K, 7, 7, C] -> mask logits [K, 28, 28, num_classes]."""
        x = roi_feats.astype(self.dtype)
        for i in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                                kernel_init=kaiming_normal_fan_out,
                                bias_init=zeros, dtype=self.dtype,
                                name=f"conv{i + 1}")(x))
        x = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                                     kernel_init=kaiming_normal_fan_out,
                                     bias_init=zeros, dtype=self.dtype,
                                     name="deconv")(x))
        logits = nn.Conv(self.num_classes, (1, 1),
                         kernel_init=kaiming_normal_fan_out, bias_init=zeros,
                         dtype=self.dtype, name="mask_fcn_logits")(x)
        logits = logits.astype(jnp.float32)
        if logits.shape[1] != self.mask_size:
            logits = resize_bilinear(logits, (self.mask_size, self.mask_size))
        return logits
