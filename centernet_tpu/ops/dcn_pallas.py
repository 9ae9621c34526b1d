"""Pallas TPU kernels: modulated deformable convolution (DCNv2 semantics,
offsets clamped to +-radius — the ``stencil_deform_conv`` contract).

Replaces the reference's external CUDA DCNv2 op (reference:
requirements.txt:1, used at pose_dla_dcn.py:441-449, resnet_dcn.py:202-210).

Design (measured on v5e, see BENCHMARKS.md "DCN implementation study"):

* XLA's TPU gather moves ~25-35 GB/s and its transpose is a scatter-add
  another ~2 orders slower — any XLA gather formulation is dead on arrival.
* A dense-stencil expansion ((2r+2)^2 shifted FMA passes) is VMEM-traffic
  bound at ~(span^2 * 9) full-tile passes — measured ~6 ms/img/layer even
  with ideal Mosaic codegen at the dominant DLA scale.
* Mosaic DOES support an exact per-sublane-row *lane* gather
  (``jnp.take_along_axis(arr2d, idx2d, axis=1)`` with f32/i32 operands,
  single-vreg lane extent).  That collapses the x-axis bilinear selection
  to TWO gathers per (tap, row-shift) instead of 13 masked FMA passes.

Kernel layout: tiles are [rows(plane), C(sublane), W(lane)], so

  - the y-axis selection is a *static* plane slice per integer row shift
    (the 2r+2 dense loop — only the y axis pays the dense expansion),
  - the x-axis bilinear selection is a per-lane gather with the tap's
    column index, shared across channels (bf16 channel pairs are bitcast
    to i32 so one gather moves two channels),
  - the modulation mask and in-image validity are folded into the two
    corner coefficients (zero outside the image, matching the reference
    CUDA kernel),
  - per tap the accumulated column block contracts with W_k on the MXU.

STATUS (round 2, measured honestly — single-call scalar-fetch timing):
numerically exact, but NOT viable on the current axon runtime: every
pallas_call pays a ~30-45 ms invocation tax and Mosaic executes the body
at ~250 GB/s effective VMEM bandwidth / ~4 Tflop/s in-kernel MXU (~2% of
the chip), giving ~360 ms/img/layer marginal vs 2.4 ms for the XLA dense
stencil.  The production fast path is ``ops.dcn.banded_deform_conv`` (the
same banded-selection idea expressed as XLA batched matmuls); this kernel
is kept for runtimes with sane Pallas dispatch.  Forward only.

Constraints: stride 1, same-size output (the only config the model zoo
uses), feature width <= 128 (single-vreg lane gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _plan(h, w, ci, dtype):
    """Tile/pad plan shared by forward and backward."""
    th = 1
    for cand in (16, 8, 4, 2, 1):
        if h % cand == 0:
            th = cand
            break
    w2 = 128  # lane width; callers guarantee w <= 128
    pack = dtype == jnp.bfloat16 and ci % 2 == 0
    return th, w2, pack


def _gather_corners(x_tile, lo, sy, th, ci, pack, idx0, idx1):
    """Gather the two x-corners for one integer row shift.

    x_tile: [rows, ci, w2] ref; returns two [th, ci, w2] values in the tile
    dtype.  With ``pack`` (bf16, even channels) the gather runs on i32
    channel pairs (same column index for both), halving gather work.
    """
    slab = x_tile[lo + sy:lo + sy + th]  # [th, ci, w2]
    w2 = slab.shape[-1]
    if pack:
        packed = pltpu.bitcast(slab, jnp.int32)  # [th, ci//2, w2]
        flat = packed.reshape(th * (ci // 2), w2)
        g0 = jnp.take_along_axis(flat, idx0, axis=1)
        g1 = jnp.take_along_axis(flat, idx1, axis=1)
        g0 = pltpu.bitcast(g0.reshape(th, ci // 2, w2), jnp.bfloat16)
        g1 = pltpu.bitcast(g1.reshape(th, ci // 2, w2), jnp.bfloat16)
        return g0, g1
    flat = slab.reshape(th * ci, w2)
    g0 = jnp.take_along_axis(flat, idx0, axis=1).reshape(th, ci, w2)
    g1 = jnp.take_along_axis(flat, idx1, axis=1).reshape(th, ci, w2)
    return g0, g1


def _tap_geometry(om, k, kk, ksize, pad, dil, r, w, w2, th, ci, pack,
                  lanes, dys, dt):
    """Per-tap clamped offsets -> gather indices + per-row-shift corner
    coefficients.

    Returns (idx0, idx1, a0_all, a1_all) where a*_all is [th, span, w2] —
    the full (dy, position) coefficient plane with modulation mask,
    in-image column validity, and the y-bilinear weight folded in.  Wide
    (span-sublane) tensors: per-dy [th, 1, w2] slices of these are cheap,
    whereas computing 5+ separate [th, 1, w2] ops per (tap, dy) lowers to
    pathological 1-sublane vector code (measured ~10x slower).
    """
    span = 2 * r + 2
    kx = (k % ksize) * dil - pad
    oy = jnp.clip(om[:, 2 * k:2 * k + 1, :], -float(r), float(r))
    ox = jnp.clip(om[:, 2 * k + 1:2 * k + 2, :], -float(r), float(r))
    mk = om[:, 2 * kk + k:2 * kk + k + 1, :]
    oxf = jnp.floor(ox)
    fx = ox - oxf
    x0 = lanes + (kx + 0) + oxf.astype(jnp.int32)  # [th,1,w2] image col
    v0 = (x0 >= 0) & (x0 <= w - 1)
    v1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
    i0 = jnp.clip(x0, 0, w2 - 1)
    i1 = jnp.clip(x0 + 1, 0, w2 - 1)
    base0 = jnp.where(v0, 1.0 - fx, 0.0) * mk
    base1 = jnp.where(v1, fx, 0.0) * mk
    # wy over all span row-shifts at once (dys: [1, span, w2] input holding
    # dy - r per sublane; Mosaic cannot materialize sublane-iota constants)
    wy_all = jnp.maximum(0.0, 1.0 - jnp.abs(oy - dys))  # [th, span, w2]
    a0_all = (wy_all * base0).astype(dt)
    a1_all = (wy_all * base1).astype(dt)
    rows = ci // 2 if pack else ci
    idx0 = jnp.broadcast_to(i0, (th, rows, w2)).reshape(th * rows, w2)
    idx1 = jnp.broadcast_to(i1, (th, rows, w2)).reshape(th * rows, w2)
    return idx0, idx1, a0_all, a1_all


def _fwd_kernel(x_hbm, om_ref, w_ref, b_ref, dys_ref, out_ref,
                x_tile, col_ref, acc_ref, sem, *,
                th, w, w2, ci, co, ksize, pad, dil, r, lo, hi, pack):
    bi = pl.program_id(0)
    t = pl.program_id(1)
    rows = th + lo + hi
    copy = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(t * th, rows)], x_tile, sem)
    copy.start()

    kk = ksize * ksize
    span = 2 * r + 2
    dt = x_tile.dtype
    lanes = jax.lax.broadcasted_iota(jnp.int32, (th, 1, w2), 2)
    om = om_ref[0]  # [th, 3kk, w2] f32
    dys = dys_ref[...][None]  # [1, span, w2]

    copy.wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for k in range(kk):
        ky = (k // ksize) * dil - pad
        idx0, idx1, a0_all, a1_all = _tap_geometry(
            om, k, kk, ksize, pad, dil, r, w, w2, th, ci, pack, lanes, dys,
            dt)
        for dy in range(span):
            sy = ky - r + dy
            g0, g1 = _gather_corners(
                x_tile, lo, sy, th, ci, pack, idx0, idx1)
            a0 = a0_all[:, dy:dy + 1, :]
            a1 = a1_all[:, dy:dy + 1, :]
            term = a0 * g0 + a1 * g1
            if dy == 0:
                col_ref[...] = term.astype(jnp.float32)
            else:
                col_ref[...] += term
        acc_ref[...] += jax.lax.dot_general(
            col_ref[...].astype(dt), w_ref[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # f32 operands at default precision run as bf16 MXU passes
            # (~3e-3 rel error) — same convention as the banded einsums
            # (ops/dcn.py): exact f32 when the model is f32, fast bf16
            # otherwise.
            precision=(jax.lax.Precision.HIGHEST
                       if dt == jnp.float32 else None))  # [th, w2, co]
    out_ref[0] = acc_ref[...] + b_ref[0].astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "stride", "padding", "dilation", "radius"),
)
def pallas_deform_conv_fwd(x, offsets, mask, weight, bias, kernel_size=3,
                           stride=1, padding=1, dilation=1, radius=4):
    """Gather-based Pallas DCN forward.  [B,H,W,Ci] -> [B,H,W,Co] f32.

    Same numerics contract as ``ops.dcn.stencil_deform_conv`` (offsets
    clamped to +-radius, zero outside the image).
    """
    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    co = weight.shape[-1]
    assert stride == 1, "pallas DCN supports stride-1 same-size"
    assert w <= 128, "pallas DCN requires feature width <= 128"
    lo = padding + radius
    hi = (kernel_size - 1) * dilation - padding + radius + 1
    th, w2, pack = _plan(h, w, ci, x.dtype)

    xt = jnp.transpose(x, (0, 1, 3, 2))  # [B, H, C, W]
    xt = jnp.pad(xt, ((0, 0), (lo, hi), (0, 0), (0, w2 - w)))
    om = jnp.concatenate(
        [offsets.astype(jnp.float32), mask.astype(jnp.float32)], axis=-1)
    omt = jnp.pad(jnp.transpose(om, (0, 1, 3, 2)),
                  ((0, 0), (0, 0), (0, 0), (0, w2 - w)))
    w_taps = weight.reshape(kk, ci, co).astype(x.dtype)
    bias2 = jnp.broadcast_to(
        bias.astype(jnp.float32).reshape(1, 1, co), (th, w2, co))
    span = 2 * radius + 2
    dys = jnp.broadcast_to(
        (jnp.arange(span, dtype=jnp.float32) - float(radius))[:, None],
        (span, w2),
    )

    kernel = functools.partial(
        _fwd_kernel, th=th, w=w, w2=w2, ci=ci, co=co, ksize=kernel_size,
        pad=padding, dil=dilation, r=radius, lo=lo, hi=hi, pack=pack)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, th, 3 * kk, w2), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w2, co), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w2, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + lo + hi, ci, w2), x.dtype),
            pltpu.VMEM((th, ci, w2), jnp.float32),
            pltpu.VMEM((th, w2, co), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xt, omt, w_taps, bias2, dys)
    return out[:, :, :w, :]
