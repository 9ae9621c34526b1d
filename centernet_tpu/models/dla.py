"""DLA-34 + DCN upsampling backbone ("dla_34").

TPU-native re-design of the reference's DLASeg
(reference: CenterNet/models/backbones/pose_dla_dcn.py):

* ``DLA`` — base network: 7x7 stride-1 stem then 6 levels
  (levels=[1,1,1,2,2,1], channels=[16,32,64,128,256,512], dla34 at
  pose_dla_dcn.py:400-406) built from recursive Tree/Root aggregation nodes
  (pose_dla_dcn.py:191-265); returns all 6 scales.
* ``IDAUp`` — iterative deep aggregation: project (DCN) -> depthwise
  frozen-bilinear transpose-conv upsample -> node (DCN) merging with the
  previous scale (pose_dla_dcn.py:457-488).
* ``DLAUp`` — pyramid of IDAUps walking coarse-to-fine
  (pose_dla_dcn.py:491-516).
* ``DLASeg`` — full backbone returning one stride-4, 64-channel feature map
  (pose_dla_dcn.py:532-570).

The recursion is unrolled at trace time (levels are static), so XLA sees a
flat conv graph. NHWC throughout; DCN is the XLA deformable conv from
``ops.dcn``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.dcn import DeformConvBNAct
from .layers import BN_MOMENTUM, BilinearConvTranspose, ConvBNAct


class DlaBasicBlock(nn.Module):
    """3x3 + 3x3 residual block with externally supplied residual
    (reference BasicBlock, pose_dla_dcn.py:28-68)."""

    planes: int
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        y = ConvBNAct(
            self.planes, 3, self.strides, dilation=self.dilation, act=True,
            dtype=self.dtype, name="conv1",
        )(x, train)
        y = ConvBNAct(
            self.planes, 3, 1, dilation=self.dilation, act=False,
            dtype=self.dtype, name="conv2",
        )(y, train)
        return nn.relu(y + residual)


class Root(nn.Module):
    """1x1 conv over concatenated children (reference Root,
    pose_dla_dcn.py:165-188)."""

    features: int
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children: Sequence[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(
            x
        ).astype(self.dtype)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive aggregation tree (reference Tree, pose_dla_dcn.py:191-265)."""

    levels: int
    in_channels: int
    out_channels: int
    strides: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        root_dim = self.root_dim
        if root_dim == 0:
            root_dim = 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels

        children = [] if children is None else list(children)

        # downsample / project the input for the residual path
        bottom = (
            nn.max_pool(
                x,
                (self.strides, self.strides),
                (self.strides, self.strides),
            )
            if self.strides > 1
            else x
        )
        if self.in_channels != self.out_channels:
            proj = nn.Conv(
                self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                name="project_conv",
            )(bottom)
            proj = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                name="project_bn",
            )(proj).astype(self.dtype)
        else:
            proj = bottom
        if residual is None:
            residual = proj

        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = DlaBasicBlock(
                self.out_channels, self.strides, dtype=self.dtype, name="tree1"
            )(x, residual, train)
            x2 = DlaBasicBlock(
                self.out_channels, 1, dtype=self.dtype, name="tree2"
            )(x1, None, train)
            out = Root(
                self.out_channels, self.root_residual, dtype=self.dtype, name="root"
            )([x2, x1] + children, train)
        else:
            x1 = Tree(
                self.levels - 1,
                self.in_channels,
                self.out_channels,
                self.strides,
                root_dim=0,
                root_residual=self.root_residual,
                dtype=self.dtype,
                name="tree1",
            )(x, residual, None, train)
            children.append(x1)
            out = Tree(
                self.levels - 1,
                self.out_channels,
                self.out_channels,
                1,
                root_dim=root_dim + self.out_channels,
                root_residual=self.root_residual,
                dtype=self.dtype,
                name="tree2",
            )(x1, None, children, train)
        return out


class DLA(nn.Module):
    """Base DLA network returning all 6 feature scales
    (reference DLA, pose_dla_dcn.py:268-378)."""

    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        x = ConvBNAct(ch[0], 7, 1, dtype=self.dtype, name="base_layer")(x, train)

        outs = []
        # level0: conv level (stride 1), level1: conv level (stride 2)
        y = x
        for i in range(self.levels[0]):
            y = ConvBNAct(
                ch[0], 3, 1, dtype=self.dtype, name=f"level0_{i}"
            )(y, train)
        outs.append(y)
        for i in range(self.levels[1]):
            y = ConvBNAct(
                ch[1], 3, 2 if i == 0 else 1, dtype=self.dtype, name=f"level1_{i}"
            )(y, train)
        outs.append(y)

        y = Tree(
            self.levels[2], ch[1], ch[2], 2, level_root=False,
            dtype=self.dtype, name="level2",
        )(y, train=train)
        outs.append(y)
        y = Tree(
            self.levels[3], ch[2], ch[3], 2, level_root=True,
            dtype=self.dtype, name="level3",
        )(y, train=train)
        outs.append(y)
        y = Tree(
            self.levels[4], ch[3], ch[4], 2, level_root=True,
            dtype=self.dtype, name="level4",
        )(y, train=train)
        outs.append(y)
        y = Tree(
            self.levels[5], ch[4], ch[5], 2, level_root=True,
            dtype=self.dtype, name="level5",
        )(y, train=train)
        outs.append(y)
        return outs


class IDAUp(nn.Module):
    """Iterative deep aggregation over a list of maps
    (reference IDAUp, pose_dla_dcn.py:457-488). Mutates ``layers[startp+1:]``
    in place semantically; we return the new list."""

    out_features: int
    up_factors: Sequence[int]  # per input i>=1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers, train: bool = False):
        layers = list(layers)
        for i in range(1, len(layers)):
            f = int(self.up_factors[i])
            y = DeformConvBNAct(
                self.out_features, dtype=self.dtype, name=f"proj_{i}"
            )(layers[i], train)
            if f > 1:
                y = BilinearConvTranspose(
                    self.out_features, f, name=f"up_{i}"
                )(y)
            y = DeformConvBNAct(
                self.out_features, dtype=self.dtype, name=f"node_{i}"
            )(y + layers[i - 1], train)
            layers[i] = y
        return layers


class DLAUp(nn.Module):
    """Pyramid of IDAUps coarse-to-fine (reference DLAUp,
    pose_dla_dcn.py:491-516)."""

    startp: int
    channels: Sequence[int]
    scales: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers, train: bool = False):
        layers = list(layers)
        channels = list(self.channels)
        scales = list(self.scales)
        in_channels = list(self.channels)

        out = [layers[-1]]
        for i in range(len(layers) - self.startp - 1):
            j = -i - 2
            ida = IDAUp(
                channels[j],
                [s // scales[j] for s in scales[j:]],
                dtype=self.dtype,
                name=f"ida_{i}",
            )
            # apply to the tail of the current list
            start = len(layers) + j
            tail = ida(layers[start:], train)
            layers[start:] = tail
            scales[j + 1 :] = [scales[j]] * len(scales[j + 1 :])
            in_channels[j + 1 :] = [channels[j]] * len(in_channels[j + 1 :])
            out.insert(0, layers[-1])
        return out


class DLASeg(nn.Module):
    """Full dla_34 backbone: DLA + DLAUp + final IDAUp, one stride-4 map
    (reference DLASeg, pose_dla_dcn.py:532-570). out_channels=64."""

    down_ratio: int = 4
    last_level: int = 5
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    dtype: Any = jnp.float32
    out_channels: int = 64
    num_stacks: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math

        first_level = int(math.log2(self.down_ratio))
        ch = list(self.channels)

        feats = DLA(self.levels, self.channels, dtype=self.dtype, name="base")(
            x, train
        )
        scales = [2 ** i for i in range(len(ch[first_level:]))]
        pyramid = DLAUp(
            first_level, ch[first_level:], scales, dtype=self.dtype, name="dla_up"
        )(feats, train)

        y = [pyramid[i] for i in range(self.last_level - first_level)]
        y = IDAUp(
            ch[first_level],
            [2 ** i for i in range(self.last_level - first_level)],
            dtype=self.dtype,
            name="ida_up",
        )(y, train)
        # stay in the compute dtype: the heads run bf16 too and cast to f32
        # only at their 1x1 outputs (heads.py) — an f32 feature here made
        # the whole head stack (3x3 C64->head_conv at the finest scale) run
        # f32 convs (caught by tests/test_bf16_discipline.py)
        return [y[-1]]
