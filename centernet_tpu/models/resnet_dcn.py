"""ResNet + DCN upsampling backbone ("resdcn_18" … "resdcn_101").

TPU-native re-design of the reference's resnet_dcn PoseResNet
(reference: CenterNet/models/backbones/resnet_dcn.py:131-278): the same
ResNet stages, then three upsampling blocks of
DCN(3x3) + BN + ReLU + ConvTranspose2d(k4, s2, bilinear-init) + BN + ReLU
with channels 256 -> 128 -> 64; ``out_channels = 64``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.dcn import DCN
from .layers import BN_MOMENTUM, ConvTranspose2x
from .resnet import RESNET_SPEC, ResNetStages


class PoseResNetDCN(nn.Module):
    num_layers: int = 18
    dtype: Any = jnp.float32
    out_channels: int = 64
    num_stacks: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layers = RESNET_SPEC[self.num_layers]
        x = ResNetStages(block, layers, dtype=self.dtype, name="resnet")(x, train)
        for i, planes in enumerate([256, 128, 64]):
            x = DCN(planes, dtype=self.dtype, name=f"dcn{i}")(x, train)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                name=f"dcn_bn{i}",
            )(x).astype(self.dtype)
            x = nn.relu(x)
            x = ConvTranspose2x(planes, bilinear_init=True, name=f"up{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                name=f"up_bn{i}",
            )(x).astype(self.dtype)
            x = nn.relu(x)
        # compute dtype out; heads cast to f32 at their outputs (heads.py)
        return [x]
