"""ResNet + 3x deconv backbone ("res_18" … "res_152").

TPU-native re-design of the reference's PoseResNet
(reference: CenterNet/models/backbones/msra_resnet.py:103-263): classic
ResNet stem + 4 stages to stride 32, then three ConvTranspose2d(k4, s2) + BN
+ ReLU blocks back to stride 4, ``out_channels = 256``. NHWC, flax.linen,
bfloat16-capable compute with f32 BatchNorm statistics.
"""

from __future__ import annotations

from typing import Any, Sequence, Type

import jax.numpy as jnp
from flax import linen as nn

from .layers import BN_MOMENTUM, ConvTransposeBNAct


class BasicBlock(nn.Module):
    expansion = 1
    planes: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(
            self.planes, (3, 3), (self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
        )(x)
        # all BN outputs return to the compute dtype (stats/affine stay f32;
        # flax would otherwise promote every activation to f32)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(
            y
        ).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(
            y
        ).astype(self.dtype)
        if self.downsample:
            residual = nn.Conv(
                self.planes * self.expansion, (1, 1),
                (self.strides, self.strides), use_bias=False, dtype=self.dtype,
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM
            )(residual).astype(self.dtype)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    expansion = 4
    planes: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(
            y
        ).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), (self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(
            y
        ).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes * self.expansion, (1, 1), use_bias=False, dtype=self.dtype
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(
            y
        ).astype(self.dtype)
        if self.downsample:
            residual = nn.Conv(
                self.planes * self.expansion, (1, 1),
                (self.strides, self.strides), use_bias=False, dtype=self.dtype,
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM
            )(residual).astype(self.dtype)
        return nn.relu(y + residual)


RESNET_SPEC = {
    18: (BasicBlock, [2, 2, 2, 2]),
    34: (BasicBlock, [3, 4, 6, 3]),
    50: (Bottleneck, [3, 4, 6, 3]),
    101: (Bottleneck, [3, 4, 23, 3]),
    152: (Bottleneck, [3, 8, 36, 3]),
}


class ResNetStages(nn.Module):
    """Stem + 4 residual stages; returns the stride-32 feature map."""

    block: Type[nn.Module]
    layers: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            64, (7, 7), (2, 2), padding=((3, 3), (3, 3)), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, name="bn1"
        )(x).astype(self.dtype)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for stage, (planes, blocks) in enumerate(
            zip([64, 128, 256, 512], self.layers)
        ):
            strides = 1 if stage == 0 else 2
            for i in range(blocks):
                s = strides if i == 0 else 1
                need_ds = s != 1 or inplanes != planes * self.block.expansion
                x = self.block(
                    planes,
                    strides=s,
                    downsample=need_ds and i == 0,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train)
                inplanes = planes * self.block.expansion
        return x


class PoseResNet(nn.Module):
    """ResNet backbone + 3 deconv layers to stride 4 (out_channels=256)."""

    num_layers: int = 18
    dtype: Any = jnp.float32
    out_channels: int = 256
    num_stacks: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layers = RESNET_SPEC[self.num_layers]
        x = ResNetStages(block, layers, dtype=self.dtype, name="resnet")(x, train)
        for i, planes in enumerate([256, 256, 256]):
            x = ConvTransposeBNAct(
                planes, dtype=self.dtype, name=f"deconv{i}"
            )(x, train)
        # compute dtype out; heads cast to f32 at their outputs (heads.py)
        return [x]
