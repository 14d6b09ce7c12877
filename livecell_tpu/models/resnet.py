"""ResNet backbones in flax (NHWC, bf16 compute, f32 params).

Reimplements the torchvision ResNet-18 stage structure the reference
splits into conv1/bn1/relu/maxpool + layer1..4 (custom_maskrcnn.py:29-37),
and the ResNet-50 bottleneck variant for the transfer path
(train_transfer.py:22). Built NHWC so XLA tiles convs onto the MXU
without layout transposes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from livecell_tpu.models.init import kaiming_normal_fan_out


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    kernel_init=kaiming_normal_fan_out,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=(not train) or self.frozen_bn,
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return x


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3-3x3 with identity/projection shortcut."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = ConvBN(self.features, 3, self.stride, self.dtype,
                     self.frozen_bn, name="conv1")(x, train)
        out = nn.relu(out)
        out = ConvBN(self.features, 3, 1, self.dtype, self.frozen_bn,
                     name="conv2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = ConvBN(self.features, 1, self.stride, self.dtype,
                              self.frozen_bn, name="downsample")(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (1x1 - 3x3 - 1x1, expansion 4) for ResNet-50."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = nn.relu(ConvBN(self.features, 1, 1, self.dtype,
                             self.frozen_bn, name="conv1")(x, train))
        out = nn.relu(ConvBN(self.features, 3, self.stride, self.dtype,
                             self.frozen_bn, name="conv2")(out, train))
        out = ConvBN(self.features * 4, 1, 1, self.dtype, self.frozen_bn,
                     name="conv3")(out, train)
        if self.stride != 1 or x.shape[-1] != self.features * 4:
            identity = ConvBN(self.features * 4, 1, self.stride, self.dtype,
                              self.frozen_bn, name="downsample")(x, train)
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """Stem + 4 stages, returning the per-stage feature maps (c1..c4).

    depths/block select ResNet-18 ((2,2,2,2), BasicBlock) or
    ResNet-50 ((3,4,6,3), Bottleneck).
    """

    depths: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    bottleneck: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    # Normalize with running statistics even in train mode (torchvision
    # FrozenBatchNorm2d semantics, train_transfer.py:22 backbone): kills
    # the per-step batch-stat reduction passes; for fine-tune workflows
    # and as a measured perf option (see STATUS round 3).
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool,
                 post_stage: Sequence = ()) -> Tuple[jnp.ndarray, ...]:
        """post_stage: optional per-stage callables (e.g. bound CBAM
        modules) applied after each stage and *fed to the next stage*, the
        reference's serial chaining c2 = cbam2(layer2(cbam1(...)))
        (custom_maskrcnn.py:77-80)."""
        # Stem: 7x7/2 conv, BN, relu, 3x3/2 maxpool (floor mode like torch).
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=kaiming_normal_fan_out,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=(not train) or self.frozen_bn,
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block = Bottleneck if self.bottleneck else BasicBlock
        feats = []
        for i, (depth, width) in enumerate(zip(self.depths, self.widths)):
            for j in range(depth):
                stride = 2 if (i > 0 and j == 0) else 1
                x = block(width, stride, self.dtype, self.frozen_bn,
                          name=f"layer{i + 1}_{j}")(x, train)
            if i < len(post_stage) and post_stage[i] is not None:
                x = post_stage[i](x)
            feats.append(x)
        return tuple(feats)
