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

import os
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.dcn import DeformConvBNAct
from .layers import BN_MOMENTUM, BilinearConvTranspose, ConvBNAct


# ---------------------------------------------------------------------------
# Space-to-depth blocked stem (round 4).
#
# The stem convs (7x7 s1 C3->16 and 3x3 s1 C16 at full input resolution) run
# at ~1-2% MXU utilization: 3/16-channel operands waste the 128 lanes, and
# the device profile attributed ~13% of dla_34 infer time to them
# (BENCHMARKS.md r4 attribution). Computing them in a 2x2 space-to-depth
# representation (input [B,H,W,C] -> [B,H/2,W/2,4C]) makes the SAME
# convolution a K=4x-deeper, N=4x-wider matmul — mathematically identical,
# just a re-indexing of the weights:
#
#   y[2i+a, 2j+b, o] = sum_{u,v,c} w[u,v,c,o] x[2i+a+u-p, 2j+b+v-p, c]
#     with m = a+u-p = 2*pb + s  (pb blocked offset, s input phase)
#   => Y2[i, j, (a,b,o)] = conv(X2, W')[i, j]  where
#      W'[pb,qb,(s,t,c),(a,b,o)] = w[2pb+s+p-a, 2qb+t+p-b, c, o]
#
# Parameters keep the ORIGINAL [k,k,ci,co] shape and pytree path
# (Conv_0/kernel, BatchNorm_0/*), so checkpoints and the torch importer are
# untouched; the blocked kernel is a trace-time gather of the weights.
# BatchNorm is computed on a [..., 4, C] view so train-mode batch statistics
# reduce over all spatial positions exactly like the plain layout.
# ---------------------------------------------------------------------------


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C] with channel order (s, t, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth2` (channel order (a, b, c))."""
    b, h2, w2, cc = y.shape
    c = cc // 4
    y = y.reshape(b, h2, w2, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h2, 2 * w2, c)


def _phase_gather(w, axis, p, out_phases=2):
    """Gather one spatial kernel axis into (blocked offset, phase[, out
    phase]) form: returns array with ``axis`` replaced by [K, 2, out_phases]
    where entry (pb, s, a) reads w at u = 2*(pb - P) + s + p - a (zero when
    out of range). ``out_phases=1`` is the stride-2 case (a fixed at 0 and
    K=2, P=1)."""
    k = w.shape[axis]
    if out_phases == 2:
        P = (p + 1) // 2
        K = 2 * P + 1
    else:
        P, K = 1, 2
    pb = np.arange(K)[:, None, None]
    s = np.arange(2)[None, :, None]
    a = np.arange(out_phases)[None, None, :]
    u = 2 * (pb - P) + s + p - a  # [K, 2, out_phases]
    valid = (u >= 0) & (u < k)
    uc = np.clip(u, 0, k - 1)
    g = jnp.take(w, jnp.asarray(uc.reshape(-1)), axis=axis)
    new_shape = w.shape[:axis] + (K, 2, out_phases) + w.shape[axis + 1 :]
    g = g.reshape(new_shape)
    mshape = [1] * len(new_shape)
    mshape[axis : axis + 3] = [K, 2, out_phases]
    return g * jnp.asarray(valid.reshape(mshape), w.dtype), K


def blocked_kernel_s1(w: jnp.ndarray) -> jnp.ndarray:
    """[k, k, ci, co] (odd k, same-pad stride-1) -> the 2x2-blocked
    equivalent [K, K, 4ci, 4co] with K = 2*ceil((k//2)/2)+1."""
    k, _, ci, co = w.shape
    p = k // 2
    g, K = _phase_gather(w, 0, p)          # [K,2,2, k, ci, co]
    g, _ = _phase_gather(g, 3, p)          # [K,2,2, K,2,2, ci, co]
    # [p, s, a, q, t, b, ci, co] -> [p, q, (s, t, ci), (a, b, co)]
    g = g.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return g.reshape(K, K, 4 * ci, 4 * co)


def blocked_kernel_s2(w: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 pad-1 kernel [3, 3, ci, co] -> [2, 2, 4ci, co]: consumes
    blocked input, produces the UNBLOCKED half-resolution output (pad the
    blocked conv (1, 0) per spatial dim)."""
    k, _, ci, co = w.shape
    assert k == 3, "blocked stride-2 path is specialized to 3x3"
    g, K = _phase_gather(w, 0, 1, out_phases=1)  # [2,2,1, 3, ci, co]
    g, _ = _phase_gather(g, 3, 1, out_phases=1)  # [2,2,1, 2,2,1, ci, co]
    g = g.reshape(K, 2, K, 2, ci, co)
    # [p, s, q, t, ci, co] -> [p, q, (s, t, ci), co]
    g = g.transpose(0, 2, 1, 3, 4, 5)
    return g.reshape(K, K, 4 * ci, co)


class _Kernel(nn.Module):
    """Holds a conv kernel param at the same path/shape/init nn.Conv would
    create (name this module "Conv_0")."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class BlockedConvBNAct(nn.Module):
    """ConvBNAct computed in the 2x2-blocked representation. Identical
    parameters (Conv_0/kernel [k,k,ci,co], BatchNorm_0 with per-ORIGINAL-
    channel stats) and identical math to ConvBNAct on unblocked data.

    ``unblock_stride2=True``: the 3x3-stride-2 form — consumes blocked
    input, emits the unblocked half-resolution map.
    """

    features: int
    kernel_size: int = 3
    unblock_stride2: bool = False
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xb, train: bool = False):
        ci = xb.shape[-1] // 4
        w = _Kernel(
            (self.kernel_size, self.kernel_size, ci, self.features),
            name="Conv_0",
        )()
        if self.unblock_stride2:
            wb = blocked_kernel_s2(w).astype(self.dtype)
            pad = ((1, 0), (1, 0))
        else:
            wb = blocked_kernel_s1(w).astype(self.dtype)
            P = (wb.shape[0] - 1) // 2
            pad = ((P, P), (P, P))
        y = jax.lax.conv_general_dilated(
            xb.astype(self.dtype), wb, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # BN over a [..., phases, C] view: per-ORIGINAL-channel statistics
        # reduce over every spatial position exactly as the plain layout
        # (phase count is 4 while blocked, 1 after the unblocking conv).
        phases = 1 if self.unblock_stride2 else 4
        b_, h_, w_, _ = y.shape
        y = y.reshape(b_, h_, w_, phases, self.features)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            dtype=jnp.float32, name="BatchNorm_0",
        )(y)
        if self.act:
            y = nn.relu(y)
        y = y.astype(self.dtype)
        return y.reshape(b_, h_, w_, phases * self.features)


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
        # Blocked stem (default): the full-resolution low-channel convs run
        # in the 2x2 space-to-depth representation — same math, MXU-shaped
        # operands (see the blocked-stem section above). Identical params,
        # so CENTERNET_TPU_DLA_STEM=plain flips the implementation for any
        # checkpoint. Falls back to plain for odd input sizes (the (d|31)+1
        # eval pad rule always produces multiples of 32).
        blocked = (
            os.environ.get("CENTERNET_TPU_DLA_STEM", "blocked") == "blocked"
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        outs = []
        if blocked:
            y = space_to_depth2(x)
            y = BlockedConvBNAct(
                ch[0], 7, dtype=self.dtype, name="base_layer"
            )(y, train)
            for i in range(self.levels[0]):
                y = BlockedConvBNAct(
                    ch[0], 3, dtype=self.dtype, name=f"level0_{i}"
                )(y, train)
            # full-res C16 map for API parity (unused at down_ratio 4 —
            # DCE'd by XLA unless a caller consumes it)
            outs.append(depth_to_space2(y))
            y = BlockedConvBNAct(
                ch[1], 3, unblock_stride2=True, dtype=self.dtype,
                name="level1_0",
            )(y, train)
            for i in range(1, self.levels[1]):
                y = ConvBNAct(
                    ch[1], 3, 1, dtype=self.dtype, name=f"level1_{i}"
                )(y, train)
            outs.append(y)
        else:
            x = ConvBNAct(
                ch[0], 7, 1, dtype=self.dtype, name="base_layer"
            )(x, train)
            # level0: conv level (stride 1), level1: conv level (stride 2)
            y = x
            for i in range(self.levels[0]):
                y = ConvBNAct(
                    ch[0], 3, 1, dtype=self.dtype, name=f"level0_{i}"
                )(y, train)
            outs.append(y)
            for i in range(self.levels[1]):
                y = ConvBNAct(
                    ch[1], 3, 2 if i == 0 else 1, dtype=self.dtype,
                    name=f"level1_{i}",
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
