"""DCNv2 — Modulated Deformable Convolution, TPU-native.

The reference depends on an external C++/CUDA package (DCNv2, reference:
requirements.txt:1, used at pose_dla_dcn.py:441-449 and resnet_dcn.py:202-210)
whose semantics are: an internal regular 3x3 conv predicts per-output-position
sampling offsets (2*K*K channels) and a modulation mask (K*K channels,
sigmoid); the main conv then samples its K*K taps at the deformed positions
with bilinear interpolation, scales each tap by the mask, and contracts with
the weights.

TPU design: instead of a CUDA im2col gather, we express the deformable
sampling as four weighted dense gathers per kernel tap (the bilinear corners)
followed by one big matmul that maps onto the MXU:

  cols[b, y, x, kk, ci] = bilinear(input, p0(y,x,kk) + offset[b,y,x,kk]) * mask
  out = cols.reshape(B, H, W, KK*Ci) @ W.reshape(KK*Ci, Co) + bias

Gathers are flattened-index ``take`` ops which XLA vectorizes well; the
contraction is a single MXU-friendly matmul. ``jax.grad`` differentiates the
whole thing (bilinear sampling is piecewise-linear in offsets and linear in
the input), so no custom VJP is required for correctness; a fused Pallas
kernel for the forward/backward hot path lives in ``dcn_pallas.py``.

Out-of-bounds samples contribute zero, matching the reference kernel's
zero-padding semantics.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch BN momentum 0.1 == flax decay 0.9 (kept local: importing
# models.layers here would create a package-import cycle).
BN_MOMENTUM = 0.9


def deform_sample(
    x: jax.Array,  # [B, H, W, Ci]
    offsets: jax.Array,  # [B, H, W, 2*KK] (dy, dx interleaved per tap)
    mask: jax.Array,  # [B, H, W, KK] modulation in [0, 1]
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """Modulated deformable im2col: returns [B, Ho, Wo, KK, Ci].

    Offset channel layout matches DCNv2: for tap kk, channels (2kk, 2kk+1)
    are (dy, dx).

    TPU note: all four bilinear corners are fetched with ONE ``lax.gather``
    of [2, 2, Ci] blocks from a 1-pixel bottom/right zero-padded copy of the
    input — 4x less HBM traffic and 4x fewer gather ops than per-corner
    row gathers, which is what dominates this op's runtime on TPU.
    """
    cols = _tap_columns(x, offsets, kernel_size, stride, padding, dilation)
    out = jnp.stack(cols, axis=3)  # [B, Ho, Wo, KK, Ci]
    return out * mask[..., None].astype(x.dtype)


_GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(1, 2, 3),
    collapsed_slice_dims=(),
    start_index_map=(0, 1),
)


def _tap_columns(x, offsets, kernel_size, stride, padding, dilation):
    """Per-tap deformable bilinear sampling (shared by deform_sample and
    dcn_v2). Returns a list of KK arrays [B, Ho, Wo, Ci].

    Processing tap-by-tap caps the materialized gather intermediate at
    [B, Ho*Wo, 2, 2, Ci] per tap instead of KK times that.
    """
    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    ho = (h + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1

    oy = jax.lax.broadcasted_iota(jnp.float32, (ho, wo), 0) * stride - padding
    ox = jax.lax.broadcasted_iota(jnp.float32, (ho, wo), 1) * stride - padding
    off = offsets.reshape(b, ho, wo, kk, 2)
    xpad = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))

    def gather_one(xp, st):
        return jax.lax.gather(
            xp,
            st,
            _GATHER_DNUMS,
            slice_sizes=(2, 2, ci),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    cols = []
    for k in range(kk):
        ky = (k // kernel_size) * dilation
        kx = (k % kernel_size) * dilation
        py = oy[None] + ky + off[:, :, :, k, 0]  # [B, Ho, Wo]
        px = ox[None] + kx + off[:, :, :, k, 1]

        y0f = jnp.floor(py)
        x0f = jnp.floor(px)
        wy1 = py - y0f
        wx1 = px - x0f
        wy0 = 1.0 - wy1
        wx0 = 1.0 - wx1

        def _inb(yc, xc):
            return ((yc >= 0) & (yc < h) & (xc >= 0) & (xc < w)).astype(x.dtype)

        # [B, Ho, Wo, 2, 2] corner weights with zero-outside masking.
        cw = jnp.stack(
            [
                jnp.stack(
                    [wy0 * wx0 * _inb(y0f, x0f), wy0 * wx1 * _inb(y0f, x0f + 1)],
                    axis=-1,
                ),
                jnp.stack(
                    [
                        wy1 * wx0 * _inb(y0f + 1, x0f),
                        wy1 * wx1 * _inb(y0f + 1, x0f + 1),
                    ],
                    axis=-1,
                ),
            ],
            axis=-2,
        ).astype(x.dtype)

        y0 = jnp.clip(y0f, 0, h - 1).astype(jnp.int32)
        x0 = jnp.clip(x0f, 0, w - 1).astype(jnp.int32)
        starts = jnp.stack([y0, x0], axis=-1).reshape(b, ho * wo, 2)

        blocks = jax.vmap(gather_one)(xpad, starts)  # [B, N, 2, 2, Ci]
        blocks = blocks.reshape(b, ho, wo, 2, 2, ci)
        cols.append(
            jnp.einsum(
                "bhwyx,bhwyxc->bhwc",
                cw,
                blocks,
                preferred_element_type=x.dtype,
            )
        )
    return cols


def dcn_v2(
    x: jax.Array,  # [B, H, W, Ci]
    offsets: jax.Array,
    mask: jax.Array,
    weight: jax.Array,  # [KK*Ci, Co] (tap-major rows: kk*Ci + ci)
    bias: jax.Array,  # [Co]
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """Modulated deformable conv forward: [B, Ho, Wo, Co].

    Accumulates tap-by-tap so the im2col intermediate never materializes at
    full [.., KK, Ci] size: each tap contributes one [Ci -> Co] matmul on the
    MXU with f32 accumulation.
    """
    kk = kernel_size * kernel_size
    ci = x.shape[-1]
    cols = _tap_columns(x, offsets, kernel_size, stride, padding, dilation)
    w_taps = weight.reshape(kk, ci, weight.shape[-1])
    out = None
    for k in range(kk):
        col_k = cols[k] * mask[..., k : k + 1].astype(cols[k].dtype)
        term = jnp.einsum(
            "bhwc,co->bhwo",
            col_k,
            w_taps[k],
            preferred_element_type=jnp.float32,
        )
        out = term if out is None else out + term
    return out + bias


class DCN(nn.Module):
    """Flax module matching the reference's ``DCN(c_in, c_out, (3,3), ...)``
    API surface (reference: pose_dla_dcn.py:441-449).

    The offset/mask conv is initialized to zero (standard DCNv2 practice:
    starts as a plain conv) and the main weight uses kaiming-uniform-like
    default init.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kk = self.kernel_size * self.kernel_size
        conv_offset = nn.Conv(
            3 * kk,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            use_bias=True,
            name="conv_offset_mask",
        )(x)
        o1, o2, m = jnp.split(conv_offset, [kk, 2 * kk], axis=-1)
        # DCNv2 layout: o1 = dy per tap, o2 = dx per tap
        offsets = jnp.stack([o1, o2], axis=-1).reshape(*o1.shape[:-1], 2 * kk)
        mask = jax.nn.sigmoid(m)

        ci = x.shape[-1]
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (kk * ci, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return dcn_v2(
            x,
            offsets,
            mask,
            weight,
            bias,
            self.kernel_size,
            self.stride,
            self.padding,
            self.dilation,
        )


class DeformConvBNAct(nn.Module):
    """DCN + BN + ReLU (reference DeformConv, pose_dla_dcn.py:435-454)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DCN(self.features, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM
        )(x)
        return nn.relu(x)
