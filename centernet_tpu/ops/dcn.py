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

    Offset channel layout matches DCNv2: for tap kk, channels (2kk, 2kk+1) are
    (dy, dx).
    """
    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    ho = (h + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1

    # Base sampling grid per output position and tap.
    oy = jax.lax.broadcasted_iota(jnp.float32, (ho, wo), 0) * stride - padding
    ox = jax.lax.broadcasted_iota(jnp.float32, (ho, wo), 1) * stride - padding
    ky = jnp.arange(kernel_size, dtype=jnp.float32) * dilation
    kx = jnp.arange(kernel_size, dtype=jnp.float32) * dilation
    base_y = oy[:, :, None] + jnp.repeat(ky, kernel_size)[None, None, :]  # [Ho,Wo,KK]
    base_x = ox[:, :, None] + jnp.tile(kx, kernel_size)[None, None, :]

    off = offsets.reshape(b, ho, wo, kk, 2)
    py = base_y[None] + off[..., 0]  # [B, Ho, Wo, KK]
    px = base_x[None] + off[..., 1]

    # Bilinear corners with zero padding outside the image.
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy1 = py - y0
    wx1 = px - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    flat = x.reshape(b, h * w, ci)

    def corner(yc, xc, wgt):
        inb = (yc >= 0) & (yc < h) & (xc >= 0) & (xc < w)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        idx = (yi * w + xi).reshape(b, -1)  # [B, Ho*Wo*KK]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(b, ho, wo, kk, ci)
        return vals * (wgt * inb.astype(x.dtype))[..., None]

    out = (
        corner(y0, x0, wy0 * wx0)
        + corner(y0, x0 + 1, wy0 * wx1)
        + corner(y0 + 1, x0, wy1 * wx0)
        + corner(y0 + 1, x0 + 1, wy1 * wx1)
    )
    return out * mask[..., None]


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
    """Modulated deformable conv forward: [B, Ho, Wo, Co]."""
    cols = deform_sample(
        x, offsets, mask, kernel_size, stride, padding, dilation
    )  # [B,Ho,Wo,KK,Ci]
    b, ho, wo, kk, ci = cols.shape
    out = jnp.einsum(
        "bhwk,kc->bhwc",
        cols.reshape(b, ho, wo, kk * ci),
        weight,
        preferred_element_type=jnp.float32,
    )
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
