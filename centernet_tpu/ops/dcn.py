"""DCNv2 — Modulated Deformable Convolution, TPU-native.

The reference depends on an external C++/CUDA package (DCNv2, reference:
requirements.txt:1, used at pose_dla_dcn.py:441-449 and resnet_dcn.py:202-210)
whose semantics are: an internal regular 3x3 conv predicts per-output-position
sampling offsets (2*K*K channels) and a modulation mask (K*K channels,
sigmoid); the main conv then samples its K*K taps at the deformed positions
with bilinear interpolation, scales each tap by the mask, and contracts with
the weights.

TPU design. Deformable sampling is a scatter/gather workload that maps badly
onto the TPU's dense units: XLA's TPU gather moves ~25-35 GB/s (measured on
v5e, any slice shape) and its BACKWARD is a scatter-add that is another two
orders of magnitude slower. The implementation hierarchy:

* ``banded_deform_conv`` (round-2 fast path) — offsets clamped to
  +-radius (tight: [-r, r-1/64]); only the Y axis pays the dense (2r+1) row-shift expansion,
  the X-axis bilinear selection is a per-row one-hot BAND MATRIX
  contracted on the MXU; exact bilinear numerics within the clamp, plain
  autodiff (dense matmul transposes; no scatter), remat under training.
* ``stencil_deform_conv`` — round-1 dense path: each tap's bilinear sample
  expanded over all (2r+1)^2 static integer shifts (HBM-bound shifted FMA
  passes) with a custom dense VJP.  Historical/ablation only: its tent-form
  weights have zero offset-gradient at integer offsets (zero init!) — see
  the banded docstring.
* ``dcn_v2`` / ``deform_sample`` — exact unbounded semantics: per tap, all
  four bilinear corners fetched with one ``lax.gather`` of [2, 2, Ci]
  blocks, scanned over taps; forward-only in practice (scatter backward).
* ``window_deform_conv`` — ONE gather per output position of an 8x8xCi
  floating window + one-hot MXU readout; exact unless a position's tap
  spread exceeds the window.
* ``dcn_pallas.pallas_deform_conv_fwd`` — exact lane-gather Pallas kernel;
  the eval-time fast path on real TPUs for layers where it fits VMEM and
  wins (round-4 re-measurement: ~2.9x faster than banded at the dominant
  fine scale; dispatch gated on ``pallas_dcn_fits`` after the round-4
  Ci=512 scoped-VMEM compile abort — see dcn_pallas.py docstring).
* plain-conv ablation (CENTERNET_TPU_DCN_IMPL=conv) for perf attribution.

``CENTERNET_TPU_DCN_IMPL`` selects banded|stencil|gather|window|pallas|conv;
``CENTERNET_TPU_DCN_RADIUS`` sets the clamp radius (default 4; the
clamp-vs-exact skew is quantified in benchmarks/bench_dcn_skew.py).

Out-of-bounds samples contribute zero, matching the reference CUDA kernel's
semantics.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Scoped Pallas opt-out for the eval-time "auto" dispatch. A contextvar —
# NOT an os.environ mutation — so disabling the Pallas path for one trace
# (e.g. the spatially-sharded serving mode, whose GSPMD partitioner cannot
# split a pallas_call along H) cannot leak into later traces in the same
# process or reorder semantics by trace order (round-4 advisor finding).
_PALLAS_ALLOWED = contextvars.ContextVar(
    "centernet_tpu_allow_pallas_dcn", default=True
)


@contextlib.contextmanager
def no_pallas_dcn():
    """Disable the Pallas DCN dispatch for traces entered in this scope."""
    token = _PALLAS_ALLOWED.set(False)
    try:
        yield
    finally:
        _PALLAS_ALLOWED.reset(token)


# Trace-time dispatch log: one entry per DCN layer per trace, recording
# which implementation the "auto" selector actually chose at that layer
# shape. bench.py embeds the deduplicated log in BENCH_r*.json so a
# dispatch-default flip is visible in the benchmark artifact itself
# (round-4 postmortem: a silent default flip crashed the driver bench).
# Bounded: entries dedupe by shape, and tracing happens once per distinct
# input shape.
DISPATCH_LOG: list = []


def _log_dispatch(h, w, ci, co, impl, radius, train):
    entry = (h, w, ci, co, impl, radius, bool(train))
    if entry not in DISPATCH_LOG:
        DISPATCH_LOG.append(entry)

# torch BN momentum 0.1 == flax decay 0.9 (kept local: importing
# models.layers here would create a package-import cycle).
BN_MOMENTUM = 0.9

# TIGHT clamp: offsets clip to [-r, r - 1/64] (not [-r, r]) so the bilinear
# floor never reaches +r — the dense row-shift expansion then spans 2r+1
# integer shifts instead of 2r+2 (a free ~10-17% cut of the banded/stencil
# work; measured 1.1-1.2x end-to-end). Offsets that saturated at exactly +r
# move by 1/64 cell = 1/16 image px at stride 4 — far below the 0.06 px
# skew of the per-scale clamp itself (BENCHMARKS.md round-3 skew study).
# 1/64 is exactly representable in f32/bf16.
CLIP_EPS = 1.0 / 64.0


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
    out = jnp.moveaxis(cols, 0, 3)  # [B, Ho, Wo, KK, Ci]
    return out * mask[..., None].astype(x.dtype)


_GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(1, 2, 3),
    collapsed_slice_dims=(),
    start_index_map=(0, 1),
)


def _bilinear_corners(py, px, h, w, dtype):
    """Shared bilinear-corner machinery for the gather paths: positions ->
    ([..., 4] corner weights in order (00, 01, 10, 11) with zero-outside
    masking, [..., ] y0/x0 int32 start coords into the (1, 2)-padded
    array). The +1 maps image coords into the padded array; the clamp to
    [-1, h-1] keeps the 2x2 block row-aligned wherever any corner can be
    valid (outside that range both corners carry zero weight, so the
    clamped block content is irrelevant). Single source of truth for
    ``_sample_one_tap`` (scan/unroll) and the fused all-tap path —
    changing the sampling convention in one place keeps every tap_mode in
    agreement (they are parity-gated in test_dcn_banded.py)."""
    y0f = jnp.floor(py)
    x0f = jnp.floor(px)
    wy1 = py - y0f
    wx1 = px - x0f
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    def _inb(yc, xc):
        return ((yc >= 0) & (yc < h) & (xc >= 0) & (xc < w)).astype(dtype)

    cw = jnp.stack(
        [
            wy0 * wx0 * _inb(y0f, x0f),
            wy0 * wx1 * _inb(y0f, x0f + 1),
            wy1 * wx0 * _inb(y0f + 1, x0f),
            wy1 * wx1 * _inb(y0f + 1, x0f + 1),
        ],
        axis=-1,
    ).astype(dtype)
    y0 = (jnp.clip(y0f, -1, h - 1) + 1).astype(jnp.int32)
    x0 = (jnp.clip(x0f, -1, w - 1) + 1).astype(jnp.int32)
    return cw, y0, x0


def _sample_one_tap(xpad, py, px, h, w, dtype):
    """Bilinear-sample one tap: positions [B, Ho, Wo] -> values [B, Ho, Wo, Ci].

    ``xpad`` is the input zero-padded by ONE pixel top/left and TWO
    bottom/right — see ``_bilinear_corners`` for the alignment contract.
    """
    b, ho, wo = py.shape
    ci = xpad.shape[-1]

    cw4, y0, x0 = _bilinear_corners(py, px, h, w, dtype)
    cw = cw4.reshape(b, ho, wo, 2, 2)
    starts = jnp.stack([y0, x0], axis=-1).reshape(b, ho * wo, 2)

    def gather_one(xp, st):
        return jax.lax.gather(
            xp,
            st,
            _GATHER_DNUMS,
            slice_sizes=(2, 2, ci),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    blocks = jax.vmap(gather_one)(xpad, starts)  # [B, N, 2, 2, Ci]
    blocks = blocks.reshape(b, ho, wo, 2, 2, ci)
    return jnp.einsum(
        "bhwyx,bhwyxc->bhwc", cw, blocks, preferred_element_type=dtype
    )


def _tap_positions(b, out_hw, offsets, kernel_size, stride, padding, dilation):
    """Sampling positions per tap: ([KK, B, Ho, Wo] py, px)."""
    ho, wo = out_hw
    kk = kernel_size * kernel_size
    oy = jax.lax.broadcasted_iota(jnp.float32, (ho, wo), 0) * stride - padding
    ox = jax.lax.broadcasted_iota(jnp.float32, (ho, wo), 1) * stride - padding
    ky = (jnp.arange(kk) // kernel_size).astype(jnp.float32) * dilation
    kx = (jnp.arange(kk) % kernel_size).astype(jnp.float32) * dilation
    off = offsets.reshape(b, ho, wo, kk, 2)
    py = oy[None, None] + ky[:, None, None, None] + jnp.moveaxis(
        off[..., 0], 3, 0
    )
    px = ox[None, None] + kx[:, None, None, None] + jnp.moveaxis(
        off[..., 1], 3, 0
    )
    return py, px


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def stencil_deform_conv(
    x: jax.Array,  # [B, H, W, Ci]
    offsets: jax.Array,  # [B, H, W, 2*KK]
    mask: jax.Array,  # [B, H, W, KK]
    weight: jax.Array,  # [KK*Ci, Co]
    bias: jax.Array,
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    radius: int = 3,
) -> jax.Array:
    """Dense-stencil modulated deformable conv — gather-free TPU fast path.

    XLA's TPU gather moves ~25-35 GB/s (measured, v5e) — 25x below HBM
    bandwidth — so any gather-based deformable conv is wall-limited. This
    formulation removes the gather entirely: offsets are clamped to
    [-radius, +radius] and each tap's bilinear sample is expanded over the
    (2*radius+1)^2 integer shifts it can touch (tight clip, see CLIP_EPS):

        col_k[p] = sum_s  relu(1-|ty-sy|) * relu(1-|tx-sx|) * xpad[p+s]

    Every term is a STATIC shifted slice of the zero-padded input times an
    elementwise weight — a stencil XLA fuses into one vectorized pass (VPU),
    followed by the per-tap MXU matmul. Zero-outside-image semantics fall
    out of the zero padding.

    Divergence vs reference DCNv2: offsets beyond ±radius are clamped
    (reference allows unbounded displacement). Trained CenterNet offsets are
    overwhelmingly sub-3px; use CENTERNET_TPU_DCN_IMPL=gather for the exact
    unbounded path.

    KNOWN GRADIENT FLAW (kept as round-1 historical path; do NOT train with
    this op): the tent form relu(1-|t-s|) has subgradient 0 at INTEGER
    offsets, and DCNv2 offsets are zero-initialized — so offsets never
    receive gradient and DCN degenerates to a mask-modulated plain conv.
    ``banded_deform_conv`` (the default) computes bilinear weights in floor
    form whose autodiff matches the reference CUDA kernel's forward-
    difference coordinate gradient; see BENCHMARKS.md "Offset-gradient
    flaw".
    """
    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    ho = (h + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1
    co = weight.shape[-1]
    assert stride == 1 and ho == h and wo == w, (
        "stencil path supports stride-1 same-size DCN (the only config the "
        "model zoo uses); use dcn_v2 otherwise"
    )

    r = radius
    # margin: base tap reach (pad..kernel) + radius (tight clip keeps the
    # bilinear +1 corner at most +r)
    lo = padding + r  # max negative displacement
    hi = (kernel_size - 1) * dilation - padding + r
    xpad = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))

    off = jnp.clip(offsets.reshape(b, h, w, kk, 2), -r, r - CLIP_EPS)
    w_taps = weight.reshape(kk, ci, co)
    mask_t = jnp.moveaxis(mask, 3, 0)  # [KK, B, H, W]
    off_t = jnp.moveaxis(off, 3, 0)  # [KK, B, H, W, 2]
    kys = (jnp.arange(kk) // kernel_size) * dilation - padding
    kxs = (jnp.arange(kk) % kernel_size) * dilation - padding

    span = 2 * r + 1  # integer shifts per axis a tight-clamped offset touches
    # f32 inputs demand true-f32 matmuls (default matmul precision runs
    # bf16 passes even for f32 operands)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None

    def tap(acc, xs):
        ky, kx, off_k, m_k, w_k = xs
        ty = ky.astype(jnp.float32) + off_k[..., 0]  # [B, H, W]
        tx = kx.astype(jnp.float32) + off_k[..., 1]

        col = jnp.zeros((b, h, w, ci), x.dtype)
        for dy in range(span):
            for dx in range(span):
                sy = ky - r + dy  # traced scalar + static span index
                sx = kx - r + dx
                wy = jnp.maximum(
                    0.0, 1.0 - jnp.abs(ty - sy.astype(jnp.float32))
                )
                wx = jnp.maximum(
                    0.0, 1.0 - jnp.abs(tx - sx.astype(jnp.float32))
                )
                wgt = (wy * wx).astype(x.dtype)[..., None]
                shifted = jax.lax.dynamic_slice(
                    xpad, (0, lo + sy, lo + sx, 0), (b, h, w, ci)
                )
                col = col + wgt * shifted
        col = col * m_k[..., None].astype(x.dtype)
        term = jnp.einsum(
            "bhwc,co->bhwo", col, w_k,
            preferred_element_type=jnp.float32, precision=prec,
        )
        return acc + term, None

    init = jnp.zeros((b, h, w, co), jnp.float32)
    out, _ = jax.lax.scan(
        tap, init, (kys, kxs, off_t, mask_t, w_taps)
    )
    return out + bias


def _stencil_fwd(x, offsets, mask, weight, bias, kernel_size, stride, padding,
                 dilation, radius):
    out = stencil_deform_conv(
        x, offsets, mask, weight, bias,
        kernel_size, stride, padding, dilation, radius,
    )
    return out, (x, offsets, mask, weight)


def _stencil_bwd(kernel_size, stride, padding, dilation, radius, res, g):
    """Memory-lean dense backward: recomputes the stencil weights on the fly
    instead of letting autodiff save every per-shift product (which OOMs at
    512^2 training). All terms are static shifted slices / pads — no
    scatter, so the backward runs at ~2-3x the forward cost instead of the
    ~100x of a TPU scatter-add."""
    x, offsets, mask, weight = res
    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    co = weight.shape[-1]
    r = radius
    lo = padding + r
    hi = (kernel_size - 1) * dilation - padding + r
    span = 2 * r + 1

    xpad = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    off_c = jnp.clip(offsets.reshape(b, h, w, kk, 2), -r, r - CLIP_EPS)
    # clip pass-through mask for the offset gradient
    off_raw = offsets.reshape(b, h, w, kk, 2)
    pass_thru = (
        (off_raw >= -r) & (off_raw <= r - CLIP_EPS)
    ).astype(jnp.float32)
    w_taps = weight.reshape(kk, ci, co)
    g = g.astype(jnp.float32)

    kys = (jnp.arange(kk) // kernel_size) * dilation - padding
    kxs = (jnp.arange(kk) % kernel_size) * dilation - padding
    off_t = jnp.moveaxis(off_c, 3, 0)
    mask_t = jnp.moveaxis(mask, 3, 0)

    def tap(carry, xs):
        dxpad = carry
        ky, kx, off_k, m_k, w_k = xs
        ty = ky.astype(jnp.float32) + off_k[..., 0]
        tx = kx.astype(jnp.float32) + off_k[..., 1]

        # g_k = dL/dcol_k (before mask): [B, H, W, C]
        gk = jnp.einsum("bhwo,co->bhwc", g, w_k, preferred_element_type=jnp.float32)
        gkm = (gk * m_k[..., None]).astype(x.dtype)

        col = jnp.zeros((b, h, w, ci), x.dtype)  # recomputed forward cols
        dty = jnp.zeros((b, h, w), jnp.float32)
        dtx = jnp.zeros((b, h, w), jnp.float32)

        for dy in range(span):
            for dx in range(span):
                sy = ky - r + dy
                sx = kx - r + dx
                ay = ty - sy.astype(jnp.float32)
                ax = tx - sx.astype(jnp.float32)
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(ay))
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(ax))
                wgt = wy * wx
                shifted = jax.lax.dynamic_slice(
                    xpad, (0, lo + sy, lo + sx, 0), (b, h, w, ci)
                )
                col = col + wgt.astype(x.dtype)[..., None] * shifted

                # dL/dxpad accumulation: place wgt*gkm at the shifted window
                contrib = wgt.astype(x.dtype)[..., None] * gkm
                dxpad = jax.lax.dynamic_update_slice(
                    dxpad,
                    jax.lax.dynamic_slice(
                        dxpad, (0, lo + sy, lo + sx, 0), (b, h, w, ci)
                    )
                    + contrib.astype(dxpad.dtype),
                    (0, lo + sy, lo + sx, 0),
                )

                # offset gradients: d wgt/dty = -sign(ay)*[|ay|<1]*wx
                xg = jnp.sum(shifted.astype(jnp.float32) * gkm, axis=-1)
                dwy = jnp.where(jnp.abs(ay) < 1.0, -jnp.sign(ay), 0.0) * wx
                dwx = jnp.where(jnp.abs(ax) < 1.0, -jnp.sign(ax), 0.0) * wy
                dty = dty + dwy * xg
                dtx = dtx + dwx * xg

        colm = col * m_k[..., None].astype(x.dtype)
        dw_k = jnp.einsum(
            "bhwc,bhwo->co", colm, g, preferred_element_type=jnp.float32
        )
        dmask_k = jnp.sum(col.astype(jnp.float32) * gk, axis=-1)
        return dxpad, (dty, dtx, dmask_k, dw_k)

    dxpad0 = jnp.zeros_like(xpad, jnp.float32)
    dxpad, (dty, dtx, dmask_t, dw) = jax.lax.scan(
        tap, dxpad0, (kys, kxs, off_t, mask_t, w_taps)
    )

    dx = dxpad[:, lo : lo + h, lo : lo + w, :].astype(x.dtype)
    doff = jnp.stack([dty, dtx], axis=-1)  # [KK, B, H, W, 2]
    doff = jnp.moveaxis(doff, 0, 3) * pass_thru  # [B, H, W, KK, 2]
    doff = doff.reshape(b, h, w, 2 * kk).astype(offsets.dtype)
    dmask = jnp.moveaxis(dmask_t, 0, 3).astype(mask.dtype)
    dweight = dw.reshape(kk * ci, co).astype(weight.dtype)
    dbias = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32)
    return dx, doff, dmask, dweight, dbias


stencil_deform_conv.defvjp(_stencil_fwd, _stencil_bwd)


def banded_deform_conv(
    x: jax.Array,  # [B, H, W, Ci]
    offsets: jax.Array,  # [B, H, W, 2*KK]
    mask: jax.Array,  # [B, H, W, KK]
    weight: jax.Array,  # [KK*Ci, Co]
    bias: jax.Array,
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    radius: int = 4,
    unroll_taps: bool = False,
    acc32: bool = True,
    dy_stack: bool = False,
) -> jax.Array:
    """Banded-matmul modulated deformable conv — MXU fast path (pure XLA).

    Same numerics contract as ``stencil_deform_conv`` (offsets clamped to
    +-radius, zero outside the image), but instead of expanding the bilinear
    product over all (2r+1)^2 integer shifts as HBM-bound shifted FMA passes,
    only the Y axis is densely expanded (2r+1 row shifts; tight clip
    [-r, r-1/64] keeps the bilinear floor below +r); the X-axis
    bilinear selection becomes a per-row banded ONE-HOT MATRIX contracted on
    the MXU:

        col_k[p] = sum_dy wy_k,dy(p) * (Mx_k[p, :] @ xrows_dy[p_row, :, :])

    where Mx_k[b, h, w, q] holds (1-fx) at q = x0(p) and fx at q = x0+1 —
    two nonzeros per output position over the W+2r+k halo columns.  HBM
    passes drop from 9*(2r+1)^2 (=729 at r=4) to ~9*(2r+1) plus the one-hot
    materialization; the selection work rides the MXU.  Gradients are plain
    autodiff (dense matmuls; the one-hot comparisons carry no gradient, the
    fx/wy factors carry exactly the bilinear derivative) — wrap in
    ``jax.checkpoint`` for training so the one-hot tensors are recomputed
    rather than saved.

    ``acc32=False`` accumulates the selection einsums and the row-shift sum
    in the compute dtype instead of f32 (halves t_dy write/read traffic when
    the epilogue FMA chain doesn't fuse; ~2^-8 relative rounding on the
    2-term bilinear sums). The final tap->output matmul always accumulates
    f32. Default since r4 via the DCN module (infer 91.1 -> 103.75 img/s);
    ``CENTERNET_TPU_DCN_ACC=f32`` restores f32 accumulation model-wide.

    ``dy_stack=True`` (round-4): contract ALL n_sy row shifts in ONE einsum
    per tap — the row stack rides the rhs channel axis ([B,H,WH,n_sy*Ci],
    built once per layer and shared by every tap), so the [B,H,W,WH]
    one-hot is READ ONCE per tap instead of once per (tap, dy). The r3
    per-(tap,dy) form is HBM-bound and its dominant traffic is exactly
    those re-reads plus the t_dy round-trips (attribution in
    BENCHMARKS.md). wy weights for shifts outside the tap's ±r window are
    identically zero (oyf is clamped into [-r, r-1]), so contracting the
    full n_sy stack is numerically identical. A similar variant measured
    2.02 vs 1.34 ms in round 3 — at radius 4 with f32 accumulation, where
    the stacked tensor is 2x wider and every round-trip is f32; at the
    round-4 per-scale default (fine maps r=2) with bf16 accumulation the
    traffic math inverts. Env: ``CENTERNET_TPU_DCN_STACK=1``.

    Measured (v5e, B8 512^2-scale dominant layer, bf16): see BENCHMARKS.md.
    """
    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    co = weight.shape[-1]
    assert stride == 1, "banded path supports stride-1 same-size DCN"
    r = radius
    span = 2 * r + 1  # tight clip: floor(off) < r, so 2r+1 row shifts
    lo = padding + r
    hi = (kernel_size - 1) * dilation - padding + r
    wh = w + lo + hi
    dt = x.dtype

    xpad = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    # weights ride the MXU in the compute dtype (a stray f32 weight would
    # promote the whole tap matmul back to f32)
    w_taps = weight.reshape(kk, ci, co).astype(dt)
    # f32 inputs demand true-f32 matmuls (TPU dots default to bf16 passes);
    # bf16 production inputs keep the fast default.
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None

    off = jnp.clip(offsets.reshape(b, h, w, kk, 2), -r, r - CLIP_EPS)
    qx = jnp.arange(wh, dtype=jnp.int32)  # halo column index
    px = jnp.arange(w, dtype=jnp.int32)

    # row-shifted views are shared across taps (sy = ky - r + dy spans
    # [-pad-r, (k-1)d-pad+r+1] over all (tap, dy) pairs): slice each once
    # and stack so the dy loop can be a lax.scan — the fully unrolled form
    # (9 taps x (2r+1) einsums x layers) produced XLA graphs that took
    # >25 min to compile for the 512^2 dla_34 training step.
    sy_min = -padding - r
    sy_max = (kernel_size - 1) * dilation - padding + r
    n_sy = sy_max - sy_min + 1
    if dy_stack:
        # [B, H, WH, n_sy*Ci]: all row shifts on the rhs channel axis,
        # built once per layer and shared across taps/the scan
        xstack = jnp.stack(
            [xpad[:, lo + sy : lo + sy + h, :, :]
             for sy in range(sy_min, sy_max + 1)],
            axis=3,
        ).reshape(b, h, wh, n_sy * ci)
        xrows_all = None
    else:
        xrows_all = jnp.stack(
            [
                jax.lax.dynamic_slice(xpad, (0, lo + sy, 0, 0), (b, h, wh, ci))
                for sy in range(sy_min, sy_max + 1)
            ]
        )  # [n_sy, B, H, WH, Ci]

    kys = (jnp.arange(kk) // kernel_size) * dilation - padding
    kxs = (jnp.arange(kk) % kernel_size) * dilation - padding

    acc_dt = jnp.float32 if acc32 else dt

    def tap_col(ky, kx, off_k, m_k):
        oy = off_k[..., 0]
        ox = off_k[..., 1]
        oxf = jnp.floor(ox)
        fx = (ox - oxf).astype(dt)
        # y-bilinear in FLOOR form (one-hot corners + fractional part), NOT
        # the tent relu(1-|oy-s|): the tent's subgradient at integer
        # offsets is 0, so zero-initialized DCNv2 offsets would NEVER
        # receive gradient through the y axis (the reference CUDA kernel's
        # coordinate gradient is the forward difference there — floor form
        # reproduces exactly that).  This is also why the round-1 stencil
        # path silently froze offsets at their zero init during training.
        oyf = jnp.floor(oy)
        fy = oy - oyf
        # one-hot bilinear x-selection matrix [B, H, W, WH] (halo coords;
        # the zero padding supplies zero-outside-image semantics)
        x0 = px[None, None, :] + (kx + lo) + oxf.astype(jnp.int32)
        mx = jnp.where(qx == x0[..., None], (1.0 - fx)[..., None], 0.0) + \
            jnp.where(qx == x0[..., None] + 1, fx[..., None], 0.0)
        mx = mx.astype(dt)

        if dy_stack:
            # ONE selection dot per tap over the full row stack (one-hot
            # read once); the per-shift bilinear y-weights then contract
            # the n_sy axis on the VPU. Shifts outside this tap's ±r
            # window get wy == 0 exactly (oyf ∈ [-r, r-1]), so including
            # them changes nothing numerically.
            t_all = jnp.einsum(
                "bhwq,bhqz->bhwz", mx, xstack,
                preferred_element_type=acc_dt, precision=prec,
            ).reshape(b, h, w, n_sy, ci)
            # s_rel[s] = (sy_min + s) - ky: the shift relative to the tap
            # row (ky may be a traced scan scalar — keep this jnp math)
            s_rel = jnp.arange(n_sy, dtype=jnp.float32) + (
                jnp.float32(sy_min) - ky
            )
            wy7 = (
                jnp.where(oyf[..., None] == s_rel, (1.0 - fy)[..., None], 0.0)
                + jnp.where(oyf[..., None] == s_rel - 1.0, fy[..., None], 0.0)
            ).astype(acc_dt)
            col = jnp.einsum(
                "bhwsc,bhws->bhwc", t_all, wy7,
                preferred_element_type=acc_dt,
            )
            return (col * m_k[..., None]).astype(dt)

        base = ky - r - sy_min  # stack offset of this tap's dy=0

        # dy unrolled inside the single scanned tap body: one 10-einsum
        # body compiles fast AND lets XLA fuse/overlap across row shifts
        # (a nested dy-scan measured ~3x slower at runtime).
        col = jnp.zeros((b, h, w, ci), acc_dt)
        for dy in range(span):
            xrows = jax.lax.dynamic_index_in_dim(
                xrows_all, base + dy, axis=0, keepdims=False
            )
            t_dy = jnp.einsum(
                "bhwq,bhqc->bhwc", mx, xrows,
                preferred_element_type=acc_dt, precision=prec,
            )
            s_rel = float(dy - r)
            wy = (
                jnp.where(oyf == s_rel, 1.0 - fy, 0.0)
                + jnp.where(oyf == s_rel - 1.0, fy, 0.0)
            ).astype(acc_dt)
            col = col + wy[..., None] * t_dy
        return (col * m_k[..., None]).astype(dt)

    def tap_body(acc, xs):
        ky, kx, off_k, m_k, w_k = xs
        colm = tap_col(ky, kx, off_k, m_k)
        term = jnp.einsum(
            "bhwc,co->bhwo", colm, w_k,
            preferred_element_type=jnp.float32, precision=prec,
        )
        return acc + term, None

    out = jnp.zeros((b, h, w, co), jnp.float32)
    if unroll_taps:
        import os

        # inference: fully unrolled taps with STATIC tap constants and
        # direct views (no tap-major transpose) let XLA overlap/fuse
        # across taps; training scans to keep the autodiff graph
        # compile-tractable (the unrolled 512^2 dla_34 TRAIN graph took
        # >30 min of XLA compile).
        if os.environ.get("CENTERNET_TPU_DCN_WMM", "pertap") == "stack":
            # experiment knob: ONE deep weight matmul over the tap-stacked
            # columns ([.., KK*Ci] @ [KK*Ci, Co]) instead of 9 thin
            # K=Ci/N=Co dots — same FLOPs/traffic, fuller MXU depth
            cols = []
            for k in range(kk):
                ky = (k // kernel_size) * dilation - padding
                kx = (k % kernel_size) * dilation - padding
                cols.append(
                    tap_col(ky, kx, off[:, :, :, k, :], mask[:, :, :, k])
                )
            cat = jnp.concatenate(cols, axis=-1)  # tap-major, like weight
            return (
                jnp.einsum(
                    "bhwk,ko->bhwo", cat, weight.astype(dt),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                + bias
            )
        for k in range(kk):
            ky = (k // kernel_size) * dilation - padding
            kx = (k % kernel_size) * dilation - padding
            out, _ = tap_body(
                out,
                (ky, kx, off[:, :, :, k, :], mask[:, :, :, k], w_taps[k]),
            )
    else:
        import os

        # partial unroll: compile-time vs cross-tap fusion trade
        # (unroll=9 == the fully unrolled form, >30 min XLA compile)
        unroll = int(os.environ.get("CENTERNET_TPU_DCN_SCAN_UNROLL", "1"))
        out, _ = jax.lax.scan(
            tap_body,
            out,
            (
                kys,
                kxs,
                jnp.moveaxis(off, 3, 0),  # [KK, B, H, W, 2]
                jnp.moveaxis(mask, 3, 0),  # [KK, B, H, W]
                w_taps,
            ),
            unroll=unroll,
        )
    return out + bias


@_functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def banded_deform_conv_vjp(
    x: jax.Array,  # [B, H, W, Ci]
    offsets: jax.Array,  # [B, H, W, 2*KK]
    mask: jax.Array,  # [B, H, W, KK]
    weight: jax.Array,  # [KK*Ci, Co]
    bias: jax.Array,
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    radius: int = 4,
    acc32: bool = True,
) -> jax.Array:
    """``banded_deform_conv`` with a HAND backward (round-4 train fast path).

    Same forward as the banded kernel; the custom VJP replaces autodiff's
    transpose, whose dominant cost is materializing the one-hot cotangent
    d_mx [B, H, W, WH] in f32 for every (tap, dy) pair and then reducing it
    back to the two bilinear corners (the round-4 train profile attributes
    ~60% of the dla_34 step to these transposes; the REMAT=dots OOM dump
    shows the same tensors at [9, B, H, W, WH] blowing HBM). The hand
    backward never forms d_mx: the offset gradient contracts directly
    against the two corner columns,

        d_fx[p] = sum_c d_col[p, c] * (x[x0+1] - x[x0])[p, c]
                = sum_c d_col * (S_diff @ xrows)          (floor form)
        d_fy[p] = sum_c d_col * sum_dy (1[oyf=s-1] - 1[oyf=s]) * t_dy

    which is exactly the reference CUDA kernel's forward-difference
    coordinate gradient (dmcn_get_coordinate_weight) restricted to the
    clamp — and exactly what autodiff of the floor-form banded forward
    computes, cheaper. Per (tap, dy) the backward runs 3 MXU einsums
    (recompute t_dy; corner difference v_dy; input cotangent mx^T @ d_t)
    against autodiff's 3 plus the [B,H,W,WH] f32 round-trips.

    Residuals are only (x, offsets, mask, weight) — no outer
    ``jax.checkpoint`` needed. Numerics: gradient-parity-gated against the
    autodiff banded backward in tests/test_dcn_banded.py."""
    import os as _os

    # Round-5: the TRAIN forward rides the same Pallas lane-gather kernel
    # the eval dispatch uses, where it fits and wins (the custom VJP saves
    # only the inputs, so the primal is free to use any impl with
    # identical semantics; parity gated in tests/test_dcn_pallas.py).
    if (
        jax.default_backend() == "tpu"
        and _os.environ.get("CENTERNET_TPU_DCN_PALLAS", "1") == "1"
        and _PALLAS_ALLOWED.get()
        and x.shape[2] >= 64
    ):
        from .dcn_pallas import pallas_dcn_fits, pallas_deform_conv_fwd

        if pallas_dcn_fits(
            x.shape[1], x.shape[2], x.shape[-1], weight.shape[-1],
            x.dtype, radius, kernel_size, stride, padding, dilation,
        ):
            return pallas_deform_conv_fwd(
                x, offsets, mask, weight, bias,
                kernel_size, stride, padding, dilation, radius=radius,
            )
    return banded_deform_conv(
        x, offsets, mask, weight, bias,
        kernel_size, stride, padding, dilation, radius,
        unroll_taps=False, acc32=acc32,
    )


def _banded_vjp_fwd(x, offsets, mask, weight, bias, kernel_size, stride,
                    padding, dilation, radius, acc32):
    out = banded_deform_conv_vjp(
        x, offsets, mask, weight, bias,
        kernel_size, stride, padding, dilation, radius, acc32,
    )
    return out, (x, offsets, mask, weight)


def _pallas_bwd_wins(h, w, ci, co, radius):
    """Measured-win band for the Pallas DCN backward (v5e, B8, bf16,
    round-5 bench_dcn_bwd_sweep.py): 128^2 C64->64 r2 8.64 vs 25.24 ms
    (2.92x), 64^2 C128->64 r4 13.41 vs 26.32 (1.96x), 64^2 C128->128 r4
    13.07 vs 27.05 (2.07x). Ci>128 runs as channel-block calls
    (dcn_pallas._bwd_ci_split) and is kept OFF until the split path has
    its own sweep line — no default flips on unmeasured shapes (the
    round-4 postmortem rule). 32^2 C<=128 is compile-verified on-chip by
    test_dla34_train_step_tpu's 256^2 step."""
    return w >= 32 and ci <= 128


def _banded_vjp_bwd(kernel_size, stride, padding, dilation, radius, acc32,
                    res, g):
    x, offsets, mask, weight = res
    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    co = weight.shape[-1]
    assert stride == 1
    r = radius
    import os as _os

    # Round-5 train fast path: the gather-transpose Pallas backward
    # replaces the per-(tap, dy) one-hot selection einsum transposes that
    # owned ~60% of the dla_34 train step (BENCHMARKS.md round-4 train
    # attribution). Same dispatch discipline as the eval forward: a
    # VMEM-fit predicate plus a measured win band, scoped opt-outs
    # honored. CENTERNET_TPU_DCN_BWD_PALLAS=0 restores the XLA scan.
    env = _os.environ.get("CENTERNET_TPU_DCN_BWD_PALLAS", "1")
    use_pallas = (
        jax.default_backend() == "tpu"
        and env in ("1", "force")  # "force" bypasses the win band (sweeps)
        and _PALLAS_ALLOWED.get()
        and (env == "force" or _pallas_bwd_wins(h, w, ci, co, radius))
    )
    if use_pallas:
        from .dcn_pallas import pallas_dcn_bwd_fits

        use_pallas = pallas_dcn_bwd_fits(
            h, w, ci, co, x.dtype, radius, kernel_size, stride, padding,
            dilation,
        )
    _log_dispatch(h, w, ci, co,
                  "bwd:pallas" if use_pallas else "bwd:xla", radius, True)
    if use_pallas:
        from .dcn_pallas import pallas_deform_conv_bwd

        off_raw = offsets.reshape(b, h, w, kk, 2)
        off = jnp.clip(off_raw, -r, r - CLIP_EPS)
        lo_b, hi_b = -float(r), float(r) - CLIP_EPS
        # clip pass-through incl. the 0.5 boundary-tie convention — see
        # the XLA path below for why the tie case matters.
        pass_thru = jnp.where(
            (off_raw > lo_b) & (off_raw < hi_b),
            1.0,
            jnp.where((off_raw == lo_b) | (off_raw == hi_b), 0.5, 0.0),
        )
        dx, dty, dtx, dmask, dw = pallas_deform_conv_bwd(
            x, off.reshape(b, h, w, 2 * kk), mask, weight, g,
            kernel_size, stride, padding, dilation, radius,
        )
        doff = jnp.stack([dty, dtx], axis=-1) * pass_thru
        g32 = g.astype(jnp.float32)
        return (
            dx.astype(x.dtype),
            doff.reshape(b, h, w, 2 * kk).astype(offsets.dtype),
            dmask.astype(mask.dtype),
            dw.astype(weight.dtype),
            jnp.sum(g32, axis=(0, 1, 2)).astype(weight.dtype),
        )
    span = 2 * r + 1
    lo = padding + r
    hi = (kernel_size - 1) * dilation - padding + r
    wh = w + lo + hi
    dt = x.dtype
    acc_dt = jnp.float32 if acc32 else dt
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None

    xpad = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    off_raw = offsets.reshape(b, h, w, kk, 2)
    off = jnp.clip(off_raw, -r, r - CLIP_EPS)
    # Clip pass-through for the offset cotangent, matching autodiff of
    # jnp.clip EXACTLY: clip lowers to minimum(hi, maximum(lo, x)) whose
    # min/max JVPs split gradient 0.5/0.5 at exact ties (_balanced_eq).
    # The tie case is the COMMON one here: the module-level straight-
    # through clamp pins every out-of-range offset exactly onto the
    # boundary before this kernel, and the 2x gradient a naive inclusive
    # mask gives those pinned offsets measurably changes training
    # (r=1 64^2 gate: converges under autodiff, plateaued under the
    # inclusive-mask VJP).
    lo_b, hi_b = -float(r), float(r) - CLIP_EPS
    pass_thru = jnp.where(
        (off_raw > lo_b) & (off_raw < hi_b),
        1.0,
        jnp.where((off_raw == lo_b) | (off_raw == hi_b), 0.5, 0.0),
    )
    w_taps = weight.reshape(kk, ci, co).astype(dt)
    g32 = g.astype(jnp.float32)

    sy_min = -padding - r
    sy_max = (kernel_size - 1) * dilation - padding + r
    n_sy = sy_max - sy_min + 1
    xrows_all = jnp.stack(
        [
            jax.lax.dynamic_slice(xpad, (0, lo + sy, 0, 0), (b, h, wh, ci))
            for sy in range(sy_min, sy_max + 1)
        ]
    )  # [n_sy, B, H, WH, Ci]

    qx = jnp.arange(wh, dtype=jnp.int32)
    px = jnp.arange(w, dtype=jnp.int32)
    kys = (jnp.arange(kk) // kernel_size) * dilation - padding
    kxs = (jnp.arange(kk) % kernel_size) * dilation - padding
    one = jnp.float32(1.0)

    def tap(dxstack, xs):
        ky, kx, off_k, m_k, w_k = xs
        oy = off_k[..., 0]
        ox = off_k[..., 1]
        oxf = jnp.floor(ox)
        fx = (ox - oxf).astype(dt)
        oyf = jnp.floor(oy)
        fy = oy - oyf

        x0 = px[None, None, :] + (kx + lo) + oxf.astype(jnp.int32)
        hit_lo = qx == x0[..., None]
        hit_hi = qx == x0[..., None] + 1
        # forward selection matrix (bilinear-weighted) and the corner
        # DIFFERENCE matrix (S_hi - S_lo) for the x-offset gradient
        mx = (
            jnp.where(hit_lo, (1.0 - fx)[..., None], 0.0)
            + jnp.where(hit_hi, fx[..., None], 0.0)
        ).astype(dt)
        sdiff = (
            jnp.where(hit_hi, one, 0.0) - jnp.where(hit_lo, one, 0.0)
        ).astype(dt)

        # cotangent into the (unmasked / masked) tap column
        gk = jnp.einsum(
            "bhwo,co->bhwc", g32, w_k.astype(jnp.float32),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dcol32 = gk * m_k[..., None].astype(jnp.float32)
        dcol = dcol32.astype(dt)

        col = jnp.zeros((b, h, w, ci), acc_dt)  # recomputed forward column
        ux = jnp.zeros((b, h, w, ci), acc_dt)   # sum_dy wy * (t_hi - t_lo)
        uy = jnp.zeros((b, h, w, ci), acc_dt)   # sum_dy (I_hi - I_lo) * t_dy
        base = ky - r - sy_min
        for dy in range(span):
            xrows = jax.lax.dynamic_index_in_dim(
                xrows_all, base + dy, axis=0, keepdims=False
            )
            t_dy = jnp.einsum(
                "bhwq,bhqc->bhwc", mx, xrows,
                preferred_element_type=acc_dt, precision=prec,
            )
            v_dy = jnp.einsum(
                "bhwq,bhqc->bhwc", sdiff, xrows,
                preferred_element_type=acc_dt, precision=prec,
            )
            s_rel = float(dy - r)
            i_lo = oyf == s_rel
            i_hi = oyf == s_rel - 1.0
            wy = (
                jnp.where(i_lo, 1.0 - fy, 0.0) + jnp.where(i_hi, fy, 0.0)
            ).astype(acc_dt)
            iy = (
                jnp.where(i_hi, one, 0.0) - jnp.where(i_lo, one, 0.0)
            ).astype(acc_dt)
            col = col + wy[..., None] * t_dy
            ux = ux + wy[..., None] * v_dy
            uy = uy + iy[..., None] * t_dy

            # input cotangent for this row shift: mx^T @ (wy * d_col)
            d_t = (wy[..., None].astype(dt)) * dcol
            dxr = jnp.einsum(
                "bhwq,bhwc->bhqc", mx, d_t,
                preferred_element_type=acc_dt, precision=prec,
            )
            dxstack = dxstack.at[base + dy].add(dxr)

        # offset gradients: contract the accumulated corner differences
        # against the (dy-independent) masked cotangent
        dtx = jnp.sum(ux.astype(jnp.float32) * dcol32, axis=-1)
        dty = jnp.sum(uy.astype(jnp.float32) * dcol32, axis=-1)
        dmask_k = jnp.sum(col.astype(jnp.float32) * gk, axis=-1)
        colm = (col * m_k[..., None].astype(acc_dt)).astype(dt)
        dw_k = jnp.einsum(
            "bhwc,bhwo->co", colm, g.astype(dt),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return dxstack, (dty, dtx, dmask_k, dw_k)

    import os as _os

    dxstack0 = jnp.zeros((n_sy, b, h, wh, ci), acc_dt)
    dxstack, (dty, dtx, dmask_t, dw) = jax.lax.scan(
        tap,
        dxstack0,
        (
            kys,
            kxs,
            jnp.moveaxis(off, 3, 0),  # [KK, B, H, W, 2]
            jnp.moveaxis(mask, 3, 0),  # [KK, B, H, W]
            w_taps,
        ),
        # partial unroll of the backward tap scan: more cross-tap fusion
        # per while body vs compile time (full unroll of the TRAIN graph
        # measured >30 min XLA compile in round 2)
        unroll=int(_os.environ.get("CENTERNET_TPU_DCN_BWD_UNROLL", "1")),
    )

    # fold the per-row-shift cotangent stack back onto the padded canvas
    dxpad = jnp.zeros((b, h + lo + hi, wh, ci), acc_dt)
    for s in range(n_sy):
        sy = sy_min + s
        dxpad = dxpad.at[:, lo + sy : lo + sy + h, :, :].add(dxstack[s])
    dx = dxpad[:, lo : lo + h, lo : lo + w, :].astype(x.dtype)

    doff = jnp.stack([dty, dtx], axis=-1)  # [KK, B, H, W, 2] (dy, dx)
    doff = jnp.moveaxis(doff, 0, 3) * pass_thru
    doff = doff.reshape(b, h, w, 2 * kk).astype(offsets.dtype)
    dmask = jnp.moveaxis(dmask_t, 0, 3).astype(mask.dtype)
    dweight = dw.reshape(kk * ci, co).astype(weight.dtype)
    # bias is stored alongside the weight (same param dtype)
    dbias = jnp.sum(g32, axis=(0, 1, 2)).astype(weight.dtype)
    return dx, doff, dmask, dweight, dbias


banded_deform_conv_vjp.defvjp(_banded_vjp_fwd, _banded_vjp_bwd)


WINDOW = 8  # floating-window side (see window_deform_conv)


def window_deform_conv(
    x: jax.Array,  # [B, H, W, Ci]
    offsets: jax.Array,  # [B, H, W, 2*KK]
    mask: jax.Array,  # [B, H, W, KK]
    weight: jax.Array,  # [KK*Ci, Co]
    bias: jax.Array,
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    window: int = WINDOW,
) -> jax.Array:
    """Floating-window modulated deformable conv — the TPU fast path.

    TPU gathers are index-rate-bound (~20 ns/index regardless of slice
    size), so per-tap corner gathers (KK * Ho * Wo indices) dominate DCN
    runtime. This formulation issues ONE gather per output position: an
    [window, window, Ci] block anchored at the floor of the minimum sampled
    coordinate across that position's taps. All KK taps + bilinear corners
    are then read out of the fetched window with separable one-hot
    contractions that run on the MXU.

    Exactness: identical to the reference DCNv2 semantics whenever the
    spread of sampled positions within one output position fits the window
    (window=8 covers the 3x3 tap base + bilinear + ~4px of differential
    offset). Out-of-image samples are exactly zero (corner weights are
    masked using the true unclamped positions). If a tap lands outside the
    window (pathological spread), its in-window coordinate is clamped —
    documented divergence; use ``dcn_v2`` (exact gather path,
    CENTERNET_TPU_DCN_IMPL=gather) when bit-exactness matters more than
    speed.
    """
    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    ho = (h + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1
    co = weight.shape[-1]
    n = ho * wo

    py, px = _tap_positions(
        b, (ho, wo), offsets, kernel_size, stride, padding, dilation
    )  # [KK, B, Ho, Wo]
    py = jnp.moveaxis(py, 0, 3)  # [B, Ho, Wo, KK]
    px = jnp.moveaxis(px, 0, 3)

    # Floating window anchor per position.
    ay = jnp.floor(jnp.min(py, axis=3))  # [B, Ho, Wo]
    ax = jnp.floor(jnp.min(px, axis=3))

    # Pad so any clamped anchor yields an in-bounds window; margin `window`
    # on every side. Zero padding preserves zero-outside-image sampling.
    m = window
    xpad = jnp.pad(x, ((0, 0), (m, m + window), (m, m + window), (0, 0)))
    ay_c = jnp.clip(ay, -m, h + m - window).astype(jnp.int32)
    ax_c = jnp.clip(ax, -m, w + m - window).astype(jnp.int32)
    starts = jnp.stack([ay_c + m, ax_c + m], axis=-1).reshape(b, n, 2)

    def gather_one(xp, st):
        return jax.lax.gather(
            xp,
            st,
            _GATHER_DNUMS,
            slice_sizes=(window, window, ci),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    win = jax.vmap(gather_one)(xpad, starts)  # [B, N, window, window, Ci]

    # In-window corner coordinates per tap.
    ry = py.reshape(b, n, kk) - ay_c.reshape(b, n, 1).astype(jnp.float32)
    rx = px.reshape(b, n, kk) - ax_c.reshape(b, n, 1).astype(jnp.float32)
    ry0 = jnp.floor(ry)
    rx0 = jnp.floor(rx)
    fy = ry - ry0
    fx = rx - rx0

    # Validity of each corner in IMAGE coordinates (true positions).
    y0 = jnp.floor(py).reshape(b, n, kk)
    x0 = jnp.floor(px).reshape(b, n, kk)

    def _inb(yc, xc):
        return ((yc >= 0) & (yc < h) & (xc >= 0) & (xc < w)).astype(jnp.float32)

    # Corner weights, each masked by its own in-image validity.
    w00 = (1.0 - fy) * (1.0 - fx) * _inb(y0, x0)
    w01 = (1.0 - fy) * fx * _inb(y0, x0 + 1)
    w10 = fy * (1.0 - fx) * _inb(y0 + 1, x0)
    w11 = fy * fx * _inb(y0 + 1, x0 + 1)

    # Separable one-hot window vectors: oh_y[b,n,k,window], oh_x likewise.
    iw = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, window), 3)
    ry0i = jnp.clip(ry0, 0, window - 2).astype(jnp.int32)[..., None]
    rx0i = jnp.clip(rx0, 0, window - 2).astype(jnp.int32)[..., None]
    eq_y0 = (iw == ry0i).astype(jnp.float32)
    eq_y1 = (iw == ry0i + 1).astype(jnp.float32)
    eq_x0 = (iw == rx0i).astype(jnp.float32)
    eq_x1 = (iw == rx0i + 1).astype(jnp.float32)

    # Build the [window x window] one-hot weight map per tap (4 nonzeros at
    # the bilinear corners, modulated by the DCNv2 mask), then read all taps
    # out of the window with ONE batched MXU contraction over the 64 window
    # cells.
    m_t = mask.reshape(b, n, kk)
    dt = x.dtype
    sy0 = eq_x0 * w00[..., None] + eq_x1 * w01[..., None]  # [b,n,k,window]
    sy1 = eq_x0 * w10[..., None] + eq_x1 * w11[..., None]
    woh = (
        eq_y0[..., :, None] * sy0[..., None, :]
        + eq_y1[..., :, None] * sy1[..., None, :]
    )  # [b, n, k, window(u), window(v)]
    woh = (woh * m_t[..., None, None]).astype(dt)

    cols = jnp.einsum(
        "bnkuv,bnuvc->bnkc", woh, win, preferred_element_type=dt
    )  # [B, N, KK, Ci]

    out = jnp.einsum(
        "bnkc,kco->bno",
        cols,
        weight.reshape(kk, ci, co),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, ho, wo, co) + bias


def _tap_columns(x, offsets, kernel_size, stride, padding, dilation):
    """All-tap deformable bilinear sampling: [KK, B, Ho, Wo, Ci] via a
    ``lax.scan`` over taps — one tap's graph compiled once, intermediates
    capped at one tap's [B, Ho*Wo, 2, 2, Ci]."""
    b, h, w, ci = x.shape
    ho = (h + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1
    xpad = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    py, px = _tap_positions(
        b, (ho, wo), offsets, kernel_size, stride, padding, dilation
    )

    def step(_, pyx):
        py_k, px_k = pyx
        return None, _sample_one_tap(xpad, py_k, px_k, h, w, x.dtype)

    _, cols = jax.lax.scan(step, None, (py, px))
    return cols  # [KK, B, Ho, Wo, Ci]


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
    tap_mode: str = "scan",
) -> jax.Array:
    """Modulated deformable conv forward: [B, Ho, Wo, Co].

    ``tap_mode`` trades compile time against tap-level parallelism (the
    round-3 device profile attributed six ~3.4 ms `while` loops — 18% of
    dla_34 infer device time — to this scan serializing the 9 corner
    gathers of the six 64^2 layers):

    * ``"scan"``: lax.scan over taps — one tap's graph compiled once,
      intermediates capped at one tap's [B, N, 2, 2, Ci]. Training-safe.
    * ``"unroll"``: static Python loop — XLA overlaps the 9 gathers and
      pipelines the per-tap einsums.
    * ``"fused"``: ONE gather for all taps ([B, KK*N, 2] indices) and ONE
      [B*H*W, KK*Ci] @ [KK*Ci, Co] matmul — fewer, fatter ops; the KK*Ci
      contraction fills MXU lanes that a thin Ci dot leaves idle.
    """
    kk = kernel_size * kernel_size
    b, h, w, ci = x.shape
    ho = (h + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1
    co = weight.shape[-1]

    xpad = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    py, px = _tap_positions(
        b, (ho, wo), offsets, kernel_size, stride, padding, dilation
    )
    w_taps = weight.reshape(kk, ci, co).astype(x.dtype)
    mask_t = jnp.moveaxis(mask, 3, 0)  # [KK, B, Ho, Wo]
    # Same dtype convention as the banded path: f32 models get true-f32
    # matmuls (TPU dots default to bf16 MXU passes — a 2e-3 rel skew vs
    # banded, caught by the round-5 on-chip run of the module auto-
    # dispatch parity gate); bf16 keeps the fast default.
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None

    if tap_mode == "fused":
        # [KK, B, Ho, Wo, 4] corner weights + padded start coords — the
        # same machinery _sample_one_tap uses, batched over all taps
        cw, y0, x0 = _bilinear_corners(py, px, h, w, x.dtype)
        starts = jnp.stack([y0, x0], axis=-1)  # [KK, B, Ho, Wo, 2]
        starts = jnp.moveaxis(starts, 1, 0).reshape(b, kk * ho * wo, 2)

        def gather_one(xp, st):
            return jax.lax.gather(
                xp, st, _GATHER_DNUMS, slice_sizes=(2, 2, ci),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )

        blocks = jax.vmap(gather_one)(xpad, starts)  # [B, KK*N, 2, 2, Ci]
        blocks = blocks.reshape(b, kk, ho, wo, 4, ci)
        cwt = jnp.moveaxis(cw, 1, 0)  # [B, KK, Ho, Wo, 4]
        col = jnp.einsum(
            "bkhwy,bkhwyc->bhwkc", cwt, blocks,
            preferred_element_type=x.dtype, precision=prec,
        )
        # mask: [KK, B, Ho, Wo] -> [B, Ho, Wo, KK, 1]
        col = col * jnp.transpose(mask_t, (1, 2, 3, 0))[..., None].astype(
            x.dtype
        )
        out = jnp.einsum(
            "bhwk,ko->bhwo",
            col.reshape(b, ho, wo, kk * ci),
            weight.astype(x.dtype),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return out + bias

    def step(acc, xs):
        py_k, px_k, m_k, w_k = xs
        col = _sample_one_tap(xpad, py_k, px_k, h, w, x.dtype)
        col = col * m_k[..., None].astype(x.dtype)
        term = jnp.einsum(
            "bhwc,co->bhwo", col, w_k,
            preferred_element_type=jnp.float32, precision=prec,
        )
        return acc + term, None

    init = jnp.zeros((b, ho, wo, co), jnp.float32)
    if tap_mode == "unroll":
        for k in range(kk):
            init, _ = step(init, (py[k], px[k], mask_t[k], w_taps[k]))
        return init + bias
    out, _ = jax.lax.scan(step, init, (py, px, mask_t, w_taps))
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
    def __call__(self, x, train: bool = False):
        import os

        kk = self.kernel_size * self.kernel_size
        # Implementation selection. Measured per layer at the dominant DLA
        # scale (128^2 x 64->64, bf16, v5e, single-call scalar-fetch batch
        # differencing — BENCHMARKS.md):
        #   forward ms/img:   banded r=4 1.30 | banded r=2 0.93 |
        #                     gather 2.65 | stencil r=4 5.73
        #   fwd+bwd ms/img:   banded r=4 4.78 (stencil-vjp was ~7x slower)
        # Per-scale (64^2 C128: banded 1.6 / gather 0.4; 32^2 C256:
        # 0.35 / 0.03): gather cost scales with index count, banded with
        # matmul shape quality — so the "auto" default picks banded on
        # large maps and the exact gather on small ones at inference.
        # Training always uses banded (gather's backward is a TPU
        # scatter-add, ~100x slower). CENTERNET_TPU_DCN_IMPL overrides:
        # auto | banded | gather (exact unbounded) | stencil | window |
        # pallas | conv (plain-conv ablation); CENTERNET_TPU_DCN_RADIUS
        # sets the clamp (default 4; clamp-vs-exact skew quantified in
        # benchmarks/bench_dcn_skew.py).
        impl = os.environ.get("CENTERNET_TPU_DCN_IMPL", "auto")
        radius = int(os.environ.get("CENTERNET_TPU_DCN_RADIUS", "4"))
        # Per-scale clamp, DEFAULT radius 2 on FINE maps (min dim >= 96
        # cells): fine-scale layers dominate DCN cost (~60% of the banded
        # wall time in dla_34) yet their learned offsets stay small — the
        # 512^2 production-scale study (benchmarks/bench_dcn_skew.py,
        # BENCHMARKS.md round-3) measures fine-map offsets p99 = 2.06
        # cells (vs 4-5.7 on coarse maps) and decoded-box skew of the
        # fine=2 default at 0.06 px max vs exact sampling. Set
        # CENTERNET_TPU_DCN_RADIUS_FINE=off (or 0) to clamp every scale at
        # CENTERNET_TPU_DCN_RADIUS instead.
        fine_env = os.environ.get("CENTERNET_TPU_DCN_RADIUS_FINE", "2")
        fine = 0 if fine_env in ("", "off", "none") else int(fine_env)
        if fine > 0 and min(x.shape[1], x.shape[2]) >= 96:
            radius = fine
        # Effective radius never reaches the feature-map size: with
        # radius >= min(H, W) the model can learn to push every tap out of
        # bounds and collapse the DCN output to its bias (an
        # input-independent local optimum observed on 2x2 stride-32 maps at
        # toy resolutions — BENCHMARKS.md round-3 findings). Production maps
        # (>= 16 cells at 512^2) are unaffected by the cap.
        radius = max(1, min(radius, min(x.shape[1], x.shape[2]) - 1))
        if impl == "auto":
            # Per-scale shootout (r=2, bf16, v5e, round 3): 128^2 C64
            # banded 1.34 / gather 2.74; 64^2 C128 gather 0.344 / banded
            # 0.863; 32^2 C256 banded 0.356 / gather 0.592 — gather's
            # index-rate cost only wins in the middle band. Training always
            # uses banded (gather's backward is a TPU scatter-add).
            #
            # Round-4 re-measurement: the Pallas lane-gather kernel's
            # ~30-45 ms dispatch tax (round 2, axon runtime) is GONE —
            # chained-marginal timing shows it ~2.9x faster than banded at
            # the dominant 128^2 C64 r=2 shape (benchmarks/
            # bench_dcn_pallas_sweep.py). Round-4 POSTMORTEM: gating only
            # on stride/width let the Ci=512 proj layer through, whose
            # Mosaic stack exceeds the kernel's own VMEM limit and ABORTS
            # the full-model XLA compile (BENCH_r04 rc=1). Eval dispatch
            # now additionally requires (a) pallas_dcn_fits — the kernel's
            # calibrated scoped-VMEM model — and (b) the measured-win band
            # (W >= 64: at 16-32px maps the lane padding to 128 wastes
            # 4-8x of the gather work and banded already runs ~0.35 ms).
            # CENTERNET_TPU_DCN_PALLAS=0 opts out globally;
            # no_pallas_dcn() scopes the opt-out to one trace (the spatial
            # serving mode uses it: a pallas_call is opaque to GSPMD's H
            # partitioner, parallel/spatial.py).
            use_pallas = False
            if (
                not train
                and jax.default_backend() == "tpu"
                and os.environ.get("CENTERNET_TPU_DCN_PALLAS", "1") == "1"
                and _PALLAS_ALLOWED.get()
                and x.shape[2] >= 64
            ):
                from .dcn_pallas import pallas_dcn_fits

                use_pallas = pallas_dcn_fits(
                    x.shape[1], x.shape[2], x.shape[-1], self.features,
                    self.dtype, radius, self.kernel_size, self.stride,
                    self.padding, self.dilation,
                )
            if train:
                impl = "banded"
            elif use_pallas:
                impl = "pallas"
            elif x.shape[2] >= 96 or x.shape[2] <= 16:
                # Round-5 sweep: at the coarse-map r=4 default, gather
                # beats banded at 32^2 (1.24 vs 1.79 ms — banded cost
                # scales with the row-shift span, gather's index-rate
                # cost doesn't; the round-3 "banded wins at 32^2" was an
                # r=2 measurement). banded keeps >=96 (only reached when
                # Pallas is opted out) and <=16 (0.41 vs 0.48 ms).
                impl = "banded"
            else:
                impl = "gather"
        _log_dispatch(
            x.shape[1], x.shape[2], x.shape[-1], self.features, impl,
            radius, train,
        )
        # The surrounding BN/ReLU layers run their affine math in f32; make
        # sure the deformable sampling + its matmuls run in the model's
        # compute dtype (a silent f32 input makes every selection einsum a
        # multi-pass HIGHEST-precision contraction AND doubles the one-hot
        # HBM traffic — measured as the round-2 "in-model 2x" overhead).
        x = x.astype(self.dtype)
        conv_offset = nn.Conv(
            3 * kk,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            use_bias=True,
            dtype=self.dtype,
            name="conv_offset_mask",
        )(x)
        o1, o2, m = jnp.split(conv_offset, [kk, 2 * kk], axis=-1)
        # DCNv2 layout: o1 = dy per tap, o2 = dx per tap. Offsets/mask are
        # small [.., 3*KK] tensors: keep the position math in f32 (floor /
        # one-hot comparisons) — the heavy tensors downstream are cast to
        # the compute dtype inside the kernels.
        offsets = (
            jnp.stack([o1, o2], axis=-1)
            .reshape(*o1.shape[:-1], 2 * kk)
            .astype(jnp.float32)
        )
        # Clamp ONCE at the module level so train and eval see identical
        # semantics regardless of which impl runs. Round-3 finding: the
        # "auto" choice trains with the clamped banded kernel but evaluated
        # small maps with the unbounded gather — offsets learned beyond
        # +-radius then sampled entirely different taps at eval (measured:
        # train-mode heatmap peaks 0.44 vs near-flat 0.03 eval heatmaps on
        # an overfit resdcn_18). Divergence vs reference DCNv2 (unbounded,
        # pose_dla_dcn.py:441-449) is quantified in benchmarks/
        # bench_dcn_skew.py at 512^2: the r=4-coarse/r=2-fine default
        # skews boxes <=0.06 px (a GLOBAL r=2 would skew ~2.5 px — coarse
        # maps need the full radius; fine maps don't). Set
        # CENTERNET_TPU_DCN_RADIUS high + RADIUS_FINE=off to approximate
        # unbounded (the gather impl stays exact for any radius).
        #
        # Straight-through clamp: jnp.clip's gradient is zero outside the
        # bounds, so an offset pushed past +-radius would never receive
        # gradient again (frozen, unable to return). The forward uses the
        # clamped value; the backward passes through as if unclamped.
        # Tight upper bound r - 1/64 (see CLIP_EPS) keeps the bilinear
        # floor below +r so the kernels run 2r+1 row shifts, not 2r+2.
        clamped = jnp.clip(
            offsets, -float(radius), float(radius) - CLIP_EPS
        )
        offsets = offsets + jax.lax.stop_gradient(clamped - offsets)
        mask = jax.nn.sigmoid(m.astype(jnp.float32))

        ci = x.shape[-1]
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (kk * ci, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # Rematerialize the deformable sampling in the backward pass: the
        # per-tap gathered corner blocks are large ([B, HW, 2, 2, Ci] x 9
        # taps x 14 layers blows HBM at 512^2 training) but cheap to
        # recompute relative to saving them.
        remat = jax.checkpoint
        if impl == "window":
            return remat(window_deform_conv, static_argnums=(5, 6, 7, 8))(
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
        if impl == "banded":
            # remat: the one-hot selection tensors are cheap to recompute
            # in the backward pass, expensive to save.
            fn = _functools.partial(
                banded_deform_conv,
                kernel_size=self.kernel_size,
                stride=self.stride,
                padding=self.padding,
                dilation=self.dilation,
                radius=radius,
                unroll_taps=not train,
                # Compute-dtype accumulation of the selection einsums
                # (default since r4: infer 91.1 -> 103.75 img/s,
                # BENCHMARKS.md). Numerically benign for THESE einsums:
                # each selection row has <=2 nonzero bilinear weights, so
                # "accumulation" is one add — no length-WH error growth —
                # and f32 models still accumulate f32 (acc_dt falls back
                # to x.dtype). CENTERNET_TPU_DCN_ACC=f32 restores f32
                # accumulation under bf16 models.
                acc32=os.environ.get("CENTERNET_TPU_DCN_ACC", "bf16")
                != "bf16",
                # round-4 dy-stacked selection (one dot per tap; see
                # banded_deform_conv docstring)
                dy_stack=os.environ.get("CENTERNET_TPU_DCN_STACK", "0")
                == "1",
            )
            if train:
                # Hand backward (default since r4: dla_34 train 16.7 ->
                # 29.65 img/s, BENCHMARKS.md): residuals = inputs only;
                # never materializes the [B,H,W,WH] one-hot cotangent —
                # see banded_deform_conv_vjp. Gradient-parity-gated
                # against autodiff (tests/test_dcn_banded.py);
                # CENTERNET_TPU_DCN_BWD=autodiff keeps the plain
                # transpose path for comparison.
                if os.environ.get("CENTERNET_TPU_DCN_BWD", "vjp") == "vjp":
                    return banded_deform_conv_vjp(
                        x, offsets, mask, weight, bias,
                        self.kernel_size, self.stride, self.padding,
                        self.dilation, radius,
                        os.environ.get("CENTERNET_TPU_DCN_ACC", "bf16")
                        != "bf16",
                    )
                # CENTERNET_TPU_DCN_REMAT: full (default) recomputes the
                # whole sampling in the backward; dots saves the einsum
                # outputs (faster bwd, more HBM)
                if os.environ.get("CENTERNET_TPU_DCN_REMAT", "full") == "dots":
                    fn = jax.checkpoint(
                        fn, policy=jax.checkpoint_policies.dots_saveable
                    )
                else:
                    fn = jax.checkpoint(fn)
            return fn(x, offsets, mask, weight, bias)
        if impl == "stencil":
            # custom VJP already keeps only (x, offsets, mask, weight) as
            # residuals — no remat needed.
            return stencil_deform_conv(
                x,
                offsets,
                mask,
                weight,
                bias,
                self.kernel_size,
                self.stride,
                self.padding,
                self.dilation,
                radius,
            )
        if impl == "pallas":
            if train:
                raise ValueError(
                    "CENTERNET_TPU_DCN_IMPL=pallas is forward-only (no "
                    "autodiff rule for the Pallas kernel); use banded/"
                    "stencil for training"
                )
            from .dcn_pallas import pallas_deform_conv_fwd

            return pallas_deform_conv_fwd(
                x,
                offsets,
                mask,
                weight,
                bias,
                self.kernel_size,
                self.stride,
                self.padding,
                self.dilation,
                radius=radius,
            )
        if impl == "conv":
            k = self.kernel_size
            ci = x.shape[-1]
            kern = weight.reshape(k, k, ci, self.features).astype(x.dtype)
            # conv runs in the compute dtype and upcasts AFTER: raw
            # lax.conv_general_dilated (unlike jnp ops) refuses mixed
            # operand dtypes, and with preferred_element_type=f32 its
            # transpose feeds the f32 cotangent against the bf16 kernel —
            # the conv-ablation TRAIN path crashed on exactly that
            # (caught by the r4 fail-loud bench). MXU accumulation is
            # f32 internally either way.
            y = jax.lax.conv_general_dilated(
                x,
                kern,
                (self.stride, self.stride),
                ((self.padding, self.padding), (self.padding, self.padding)),
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32)
            return y * jnp.mean(mask, axis=-1, keepdims=True) + bias
        # tap_mode: scan while training (autodiff graph stays one-tap
        # sized); unrolled at inference so XLA overlaps the 9 corner
        # gathers (the round-3 profile showed the scan's `while` loops at
        # 18% of dla_34 infer device time). CENTERNET_TPU_DCN_GATHER_MODE
        # overrides (scan | unroll | fused).
        tap_mode = os.environ.get(
            "CENTERNET_TPU_DCN_GATHER_MODE", "scan" if train else "unroll"
        )
        return remat(dcn_v2, static_argnums=(5, 6, 7, 8, 9))(
            x,
            offsets,
            mask,
            weight,
            bias,
            self.kernel_size,
            self.stride,
            self.padding,
            self.dilation,
            tap_mode,
        )


class DeformConvBNAct(nn.Module):
    """DCN + BN + ReLU (reference DeformConv, pose_dla_dcn.py:435-454)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DCN(self.features, dtype=self.dtype, name="conv")(x, train)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM
        )(x).astype(self.dtype)
        return nn.relu(x)
