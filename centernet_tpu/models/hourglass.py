"""Stacked Hourglass backbone ("hourglass").

TPU-native re-design of the reference's CornerNet large hourglass
(reference: CenterNet/models/backbones/large_hourglass.py): ``pre`` = 7x7
stride-2 conv + stride-2 residual (to stride 4), then nstack=2 recursive
hourglass modules of depth n=5 with dims [256,256,384,384,384,512] and
modules [2,2,2,2,2,4]; downsampling by stride-2 residuals (make_hg_layer,
large_hourglass.py:316-319), upsampling by nearest-neighbor 2x; inter-stack
fusion with 1x1 conv + BN residual merge (large_hourglass.py:297-313).
Returns one feature map per stack (2 supervision points); out_channels=256.

Memory note: two 512^2-input stacks are the heaviest model in the zoo — the
train step wraps stacks in ``jax.checkpoint`` (remat) at the task level.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BN_MOMENTUM, upsample_nearest_2x


class HgConv(nn.Module):
    """k x k conv + BN + ReLU (reference convolution, large_hourglass.py:11)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    with_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            (self.strides, self.strides),
            padding=((pad, pad), (pad, pad)),
            use_bias=not self.with_bn,
            dtype=self.dtype,
        )(x)
        if self.with_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM
            )(x).astype(self.dtype)
        return nn.relu(x)


class HgResidual(nn.Module):
    """3x3 residual block (reference residual, large_hourglass.py:51)."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(
            self.features, (3, 3), (self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
        )(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(
            y
        ).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(
            y
        ).astype(self.dtype)
        if self.strides != 1 or x.shape[-1] != self.features:
            skip = nn.Conv(
                self.features, (1, 1), (self.strides, self.strides),
                use_bias=False, dtype=self.dtype,
            )(x)
            skip = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM
            )(skip).astype(self.dtype)
        else:
            skip = x
        return nn.relu(y + skip)


class HgModule(nn.Module):
    """One recursive hourglass (reference kp_module, large_hourglass.py:144-207)."""

    n: int
    dims: Sequence[int]
    modules: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        curr_mod = self.modules[0]
        next_mod = self.modules[1]
        curr_dim = self.dims[0]
        next_dim = self.dims[1]

        # up1: residuals at current resolution
        up1 = x
        for i in range(curr_mod):
            up1 = HgResidual(curr_dim, dtype=self.dtype, name=f"up1_{i}")(up1, train)

        # low1: stride-2 residual downsample (make_hg_layer)
        low1 = x
        for i in range(curr_mod):
            low1 = HgResidual(
                next_dim, strides=2 if i == 0 else 1, dtype=self.dtype,
                name=f"low1_{i}",
            )(low1, train)

        if self.n > 1:
            low2 = HgModule(
                self.n - 1, self.dims[1:], self.modules[1:], dtype=self.dtype,
                name="low2",
            )(low1, train)
        else:
            low2 = low1
            for i in range(next_mod):
                low2 = HgResidual(
                    next_dim, dtype=self.dtype, name=f"low2_{i}"
                )(low2, train)

        # low3: make_layer_revr — (curr_mod-1) at next_dim then one to curr_dim
        low3 = low2
        for i in range(curr_mod - 1):
            low3 = HgResidual(next_dim, dtype=self.dtype, name=f"low3_{i}")(
                low3, train
            )
        low3 = HgResidual(curr_dim, dtype=self.dtype, name=f"low3_{curr_mod - 1}")(
            low3, train
        )

        up2 = upsample_nearest_2x(low3)
        return up1 + up2


class HourglassNet(nn.Module):
    """Full 2-stack hourglass (reference exkp/HourglassNet,
    large_hourglass.py:210-339)."""

    num_stacks: int = 2
    n: int = 5
    dims: Sequence[int] = (256, 256, 384, 384, 384, 512)
    modules: Sequence[int] = (2, 2, 2, 2, 2, 4)
    cnv_dim: int = 256
    dtype: Any = jnp.float32
    out_channels: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        curr_dim = self.dims[0]
        inter = HgConv(128, 7, strides=2, dtype=self.dtype, name="pre_conv")(x, train)
        inter = HgResidual(256, strides=2, dtype=self.dtype, name="pre_res")(
            inter, train
        )

        outs = []
        for ind in range(self.num_stacks):
            kp = HgModule(
                self.n, self.dims, self.modules, dtype=self.dtype, name=f"kp_{ind}"
            )(inter, train)
            cnv = HgConv(self.cnv_dim, 3, dtype=self.dtype, name=f"cnv_{ind}")(
                kp, train
            )
            # compute dtype out; heads cast to f32 at their outputs
            outs.append(cnv)

            if ind < self.num_stacks - 1:
                a = nn.Conv(
                    curr_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f"inter__conv_{ind}",
                )(inter)
                a = nn.BatchNorm(
                    use_running_average=not train, momentum=BN_MOMENTUM,
                    name=f"inter__bn_{ind}",
                )(a).astype(self.dtype)
                b = nn.Conv(
                    curr_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f"cnv__conv_{ind}",
                )(cnv)
                b = nn.BatchNorm(
                    use_running_average=not train, momentum=BN_MOMENTUM,
                    name=f"cnv__bn_{ind}",
                )(b).astype(self.dtype)
                inter = nn.relu(a + b)
                inter = HgResidual(
                    curr_dim, dtype=self.dtype, name=f"inters_{ind}"
                )(inter, train)
        return outs
