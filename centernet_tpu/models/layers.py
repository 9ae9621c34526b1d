"""Shared model building blocks (flax.linen, NHWC, TPU-native).

Conventions:
* All convolutions are NHWC; BatchNorm uses momentum 0.9 (reference BN
  momentum 0.1 in torch convention == 0.9 decay here).
* ``use_running_average`` is threaded via the module attribute ``train``-less
  call pattern: modules take a ``train: bool`` argument at ``__call__``.
* Frozen-bilinear transpose convolutions reproduce the reference's
  ``fill_up_weights`` init (reference: pose_dla_dcn.py:424-432,
  resnet_dcn.py:110-118).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

BN_MOMENTUM = 0.9  # decay; torch momentum 0.1


class ConvBNAct(nn.Module):
    """Conv2d + BatchNorm + optional ReLU."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    use_bias: bool = False
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=jnp.float32
        )(x)
        if self.act:
            x = nn.relu(x)
        # BN statistics/affine stay f32; activations return to the compute
        # dtype. Without this every BN upcasts the whole network to f32
        # (flax promotes with the f32 scale/bias), doubling HBM traffic and
        # silently de-optimizing the bf16 DCN/conv paths in-model.
        return x.astype(self.dtype)


def bilinear_upsample_kernel(kernel_size: int) -> jnp.ndarray:
    """2-D bilinear interpolation kernel [k, k] used for frozen-bilinear
    transpose-conv init (reference fill_up_weights, pose_dla_dcn.py:424-432)."""
    f = math.ceil(kernel_size / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = jnp.zeros((kernel_size, kernel_size), jnp.float32)
    idx = jnp.arange(kernel_size, dtype=jnp.float32)
    wi = 1.0 - jnp.abs(idx / f - c)
    return wi[:, None] * wi[None, :]


def bilinear_conv_transpose_init(kernel_size: int, channels: int):
    """Init fn for a depthwise transpose conv HWIO kernel [k, k, 1, C]."""

    k2d = bilinear_upsample_kernel(kernel_size)

    def init(key, shape, dtype=jnp.float32):
        # shape: (kh, kw, in_per_group, out) for grouped transpose conv
        del key
        kern = jnp.zeros(shape, dtype)
        return kern + k2d[:, :, None, None]

    return init


class BilinearConvTranspose(nn.Module):
    """Depthwise ConvTranspose2d(k=2f, stride=f) with frozen-bilinear weights.

    The reference initializes these upsamplers to bilinear kernels and (in
    DLA's IDAUp) keeps them grouped per-channel. We implement the depthwise
    (grouped) transpose conv as a dilated scatter + depthwise conv expressed
    with ``lax.conv_general_dilated`` using feature_group_count.
    """

    channels: int
    stride: int
    trainable: bool = True

    @nn.compact
    def __call__(self, x):
        f = self.stride
        k = 2 * f
        pad = f // 2
        kernel = self.param(
            "kernel",
            bilinear_conv_transpose_init(k, self.channels),
            (k, k, 1, self.channels),
        )
        if not self.trainable:
            kernel = jax.lax.stop_gradient(kernel)
        kernel = kernel.astype(x.dtype)  # lax.conv needs matching dtypes
        # Transpose conv == lhs-dilated conv with flipped kernel; bilinear
        # kernels are symmetric so no flip is needed.
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=((k - 1 - pad, k - 1 - pad), (k - 1 - pad, k - 1 - pad)),
            lhs_dilation=(f, f),
            rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.channels,
        )
        return y


class ConvTranspose2x(nn.Module):
    """ConvTranspose2d(k, s=2, p=1) as an lhs-dilated conv, NHWC.

    Matches torch's shape rule out = 2*in for k=4/p=1/output_padding=0.
    ``bilinear_init`` reproduces the reference's ``fill_up_weights``: a full
    (non-grouped) kernel whose [c, 0, :, :] plane is bilinear — i.e. every
    output channel upsamples input channel 0 unless trained away. We instead
    initialize the *diagonal* (each channel upsamples itself), which is what
    the original authors intended; divergence documented.
    """

    features: int
    kernel_size: int = 4
    use_bias: bool = False
    bilinear_init: bool = False

    @nn.compact
    def __call__(self, x):
        k, s, pad = self.kernel_size, 2, 1
        in_ch = x.shape[-1]

        if self.bilinear_init:
            k2d = bilinear_upsample_kernel(k)

            def init(key, shape, dtype=jnp.float32):
                del key
                kern = jnp.zeros(shape, dtype)
                diag = jnp.eye(shape[2], shape[3], dtype=dtype)
                return kern + k2d[:, :, None, None] * diag[None, None]

            kern_init = init
        else:
            kern_init = nn.initializers.normal(0.001)

        kernel = self.param("kernel", kern_init, (k, k, in_ch, self.features))
        kernel = kernel.astype(x.dtype)  # lax.conv needs matching dtypes
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=((k - 1 - pad, k - 1 - pad), (k - 1 - pad, k - 1 - pad)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class ConvTransposeBNAct(nn.Module):
    """ConvTranspose2d(k4, s2) + BN + ReLU used by the plain ResNet deconv
    path (reference: msra_resnet.py:164-192)."""

    features: int
    kernel_size: int = 4
    bilinear_init: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvTranspose2x(
            self.features,
            kernel_size=self.kernel_size,
            bilinear_init=self.bilinear_init,
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=jnp.float32
        )(y)
        return nn.relu(y).astype(self.dtype)


def upsample_nearest_2x(x):
    """nn.Upsample(scale_factor=2) equivalent, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
