"""Pallas TPU kernel: dense-stencil modulated deformable convolution.

The XLA dense-stencil path (``ops.dcn.stencil_deform_conv``) re-reads the
input feature map from HBM once per integer shift (~(2r+2)^2 * 9 passes).
This kernel performs the same computation with the input tile + halo staged
in VMEM ONCE per row-tile:

  grid (B, H/TH):
    DMA x[b, tile rows +- halo] HBM -> VMEM            (once)
    for tap k in 0..8 (static):
      ty/tx = tap base + clamped offsets               (VPU)
      col   = sum over (2r+2)^2 static shifted slices
              of the VMEM tile, weighted by
              relu(1-|ty-sy|)*relu(1-|tx-sx|)          (VPU, in-registers)
      out  += (col * mask_k) @ W_k                     (MXU, f32 accum)

Semantics match ``stencil_deform_conv``: offsets clamped to [-radius,
radius] (documented divergence from unbounded DCNv2), zero outside the
image, modulation mask applied before the weight contraction.

Stride-1, same-size (the model zoo's only DCN config).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_hbm,  # [B, H + 2*lo?, ...] padded input, ANY/HBM
    off_ref,  # [1, TH, W, 2*KK] VMEM
    mask_ref,  # [1, TH, W, KK] VMEM
    w_ref,  # [KK, C, CO] VMEM
    bias_ref,  # [1, CO] VMEM
    out_ref,  # [1, TH, W, CO] VMEM
    x_tile,  # scratch VMEM [TH + 2*margin, W2, C2]
    x_shift,  # scratch VMEM [NSHIFT, TH + 2*margin, W, C2] — aligned shifts
    col_ref,  # scratch VMEM [TH, W, C2] — per-tap deformed columns
    acc_ref,  # scratch VMEM [TH*W, CO] f32 — output accumulator
    sem,  # DMA semaphore
    *,
    th: int,
    width: int,
    channels: int,
    kernel_size: int,
    padding: int,
    dilation: int,
    radius: int,
    margin: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)

    # Stage the haloed input rows for this tile. x_hbm is pre-padded by
    # `margin` on every spatial side, so tile row 0 maps to padded row t*TH.
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * th, th + 2 * margin)],
        x_tile,
        sem,
    )
    copy.start()

    kk = kernel_size * kernel_size
    r = radius
    span = 2 * r + 2

    off = off_ref[0]  # [TH, W, 2KK] f32
    mask = mask_ref[0]  # [TH, W, KK]

    copy.wait()

    # Pre-shift the tile into lane/sublane-ALIGNED copies, one per distinct
    # absolute column shift — this pays the unaligned-slice relayout once
    # per shift instead of once per (tap, dy, dx) term.
    n_shift = 2 * r + 2 + kernel_size - 1  # distinct absolute sx values
    sx0 = -padding - r  # smallest absolute column shift
    for s in range(n_shift):
        x_shift[s] = x_tile[:, margin + sx0 + s : margin + sx0 + s + width, :]

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for k in range(kk):
        ky = (k // kernel_size) * dilation - padding
        kx = (k % kernel_size) * dilation - padding
        off_y = jax.lax.slice_in_dim(off, 2 * k, 2 * k + 1, axis=2)[:, :, 0]
        off_x = jax.lax.slice_in_dim(off, 2 * k + 1, 2 * k + 2, axis=2)[:, :, 0]
        ty = ky + jnp.clip(off_y, -r, r)  # [TH, W]
        tx = kx + jnp.clip(off_x, -r, r)

        col_ref[...] = jnp.zeros_like(col_ref)

        # fori over row shifts keeps register live ranges to one shift row.
        def row_shift(dy, _):
            sy = ky - r + dy
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ty - sy.astype(jnp.float32)))
            contrib = jnp.zeros((th, width, channels), x_tile.dtype)
            for dx in range(span):
                sx = kx - r + dx
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(tx - float(sx)))
                wgt = (wy * wx).astype(x_tile.dtype)
                patch = x_shift[sx - sx0, pl.ds(margin + sy, th), :, :]
                contrib = contrib + wgt[:, :, None] * patch
            col_ref[...] += contrib
            return 0

        jax.lax.fori_loop(0, span, row_shift, 0)

        m_k = jax.lax.slice_in_dim(mask, k, k + 1, axis=2)
        col = col_ref[...] * m_k.astype(col_ref.dtype)
        acc_ref[...] += jnp.dot(
            col.reshape(th * width, channels),
            w_ref[k],
            preferred_element_type=jnp.float32,
        )

    out = acc_ref[...] + bias_ref[0].astype(jnp.float32)
    out_ref[0] = out.reshape(th, width, out_ref.shape[-1])


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "stride", "padding", "dilation", "radius"),
)
def pallas_stencil_deform_conv(
    x: jax.Array,  # [B, H, W, Ci]
    offsets: jax.Array,  # [B, H, W, 2*KK] f32
    mask: jax.Array,  # [B, H, W, KK] f32
    weight: jax.Array,  # [KK*Ci, Co]
    bias: jax.Array,  # [Co]
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    radius: int = 3,
) -> jax.Array:
    """Pallas dense-stencil DCN. Returns [B, H, W, Co] float32."""
    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    co = weight.shape[-1]
    assert stride == 1, "stencil kernel supports stride-1 DCN"

    # halo: worst displacement = padding + radius (+1 for the high corner)
    margin = padding + radius + 1
    # Mosaic DMA slices need tiling-aligned trailing dims: pad columns to a
    # multiple of 16 (sublane) and channels to a multiple of 128 (lane).
    w2 = ((w + 2 * margin + 15) // 16) * 16
    extra = w2 - (w + 2 * margin)
    c2 = ((ci + 127) // 128) * 128
    xpad = jnp.pad(
        x,
        (
            (0, 0),
            (margin, margin),
            (margin, margin + extra),
            (0, c2 - ci),
        ),
    )

    # row tile: largest power-of-two divisor of h capped at 8 (VMEM budget)
    th = 1
    for cand in (8, 4, 2, 1):
        if h % cand == 0:
            th = cand
            break
    n_tiles = h // th

    # Zero-pad weight rows to the padded channel count (zero channels in the
    # tile then contribute nothing).
    w_taps = weight.reshape(kk, ci, co)
    w_taps = jnp.pad(w_taps, ((0, 0), (0, c2 - ci), (0, 0)))
    bias2 = bias.reshape(1, co).astype(jnp.float32)
    off_f = offsets.astype(jnp.float32)
    mask_f = mask.astype(jnp.float32)

    kernel = functools.partial(
        _kernel,
        th=th,
        width=w,
        channels=c2,
        kernel_size=kernel_size,
        padding=padding,
        dilation=dilation,
        radius=radius,
        margin=margin,
    )

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xpad, manual DMA
            pl.BlockSpec(
                (1, th, w, 2 * kk), lambda bi, ti: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, w, kk), lambda bi, ti: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, co), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * margin, w2, c2), x.dtype),
            pltpu.VMEM(
                (2 * radius + 2 + kernel_size - 1, th + 2 * margin, w, c2),
                x.dtype,
            ),
            pltpu.VMEM((th, w, c2), x.dtype),
            pltpu.VMEM((th * w, co), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xpad, off_f, mask_f, w_taps.astype(x.dtype), bias2)
    return out
