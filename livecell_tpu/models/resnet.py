"""ResNet backbones in flax (NHWC, bf16 compute, f32 params).

Reimplements the torchvision ResNet-18 stage structure the reference
splits into conv1/bn1/relu/maxpool + layer1..4 (custom_maskrcnn.py:29-37),
and the ResNet-50 bottleneck variant for the transfer path
(train_transfer.py:22). Built NHWC so XLA tiles convs onto the MXU
without layout transposes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
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


class StemConvS2D(nn.Module):
    """The 7x7/2 stem conv computed via space-to-depth (MLPerf-style).

    C_in=3 leaves the MXU's 128-lane contracting dimension ~97% empty
    on the largest spatial map of the network (r3 xprof: the stem is
    part of the lane-bound conv tail). The identical convolution is
    re-expressed as a 4x4/1 VALID conv over a 2x2 space-to-depth input
    (12 channels): zero-pad the 7x7 kernel to 8x8, regroup both kernel
    and input by (dy, dx, c). Same MACs, 4x the lane occupancy, and the
    strided input gather disappears. Bit-different only in bf16
    reduction order.

    The parameter is the UNTRANSFORMED torchvision-shape (7,7,3,64)
    kernel under the same "conv1" collection, so checkpoints and the
    torch importer are oblivious to the flag.
    """

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", kaiming_normal_fan_out, (7, 7, 3, 64),
                       jnp.float32)
        k8 = jnp.pad(k.astype(self.dtype),
                     ((0, 1), (0, 1), (0, 0), (0, 0)))
        # W'[a, b, (dy, dx, c)] = W[2a+dy, 2b+dx, c]
        k8 = k8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5) \
            .reshape(4, 4, 12, 64)

        b, h, w, c = x.shape
        out_h, out_w = (h + 1) // 2, (w + 1) // 2
        pad_b = 2 * out_h + 6 - h - 3   # reach of tap 2*(out_h-1)+7
        pad_r = 2 * out_w + 6 - w - 3
        x = jnp.pad(x.astype(self.dtype),
                    ((0, 0), (3, pad_b + (h + 3 + pad_b) % 2),
                     (3, pad_r + (w + 3 + pad_r) % 2), (0, 0)))
        hp, wp = x.shape[1], x.shape[2]
        x = x.reshape(b, hp // 2, 2, wp // 2, 2, c) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * c)
        y = jax.lax.conv_general_dilated(
            x, k8, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, :out_h, :out_w]


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
    # Compute the stem conv via space-to-depth (StemConvS2D): identical
    # math and parameter tree, full MXU lane occupancy.
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool,
                 post_stage: Sequence = ()) -> Tuple[jnp.ndarray, ...]:
        """post_stage: optional per-stage callables (e.g. bound CBAM
        modules) applied after each stage and *fed to the next stage*, the
        reference's serial chaining c2 = cbam2(layer2(cbam1(...)))
        (custom_maskrcnn.py:77-80)."""
        # Stem: 7x7/2 conv, BN, relu, 3x3/2 maxpool (floor mode like torch).
        if self.stem_s2d:
            x = StemConvS2D(self.dtype, name="conv1")(x)
        else:
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
