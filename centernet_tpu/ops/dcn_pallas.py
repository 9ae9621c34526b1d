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

STATUS (round 4 re-measurement, chained-marginal timing): the round-2
~30-45 ms per-call invocation tax on the axon runtime is GONE; the kernel
beats the banded XLA path ~2.9x at the dominant fine scale (128^2 C64,
benchmarks/bench_dcn_pallas_sweep.py) and is the eval-time dispatch
target for shapes where it both fits and wins (``pallas_dcn_fits``).
Round 5 adds the gather-transpose BACKWARD (``pallas_deform_conv_bwd``,
2-2.9x over the XLA hand VJP at Ci<=128 shapes; wide layers run as
Ci/128 channel-block calls — see ``_bwd_ci_split``).

Constraints: stride 1, same-size output (the only config the model zoo
uses), feature width <= 128 (single-vreg lane gather), and a VMEM-fit
requirement: Mosaic allocates scoped-VMEM stack slots for the unrolled
(tap x row-shift) loop's [th, Ci, 128] temporaries, so the footprint
scales with th*Ci — at dla_34's Ci=512 proj layer the round-4 kernel
exceeded its own 100MB ``vmem_limit_bytes`` and XLA aborted the FULL
MODEL compile (BENCH_r04 rc=1: "Scoped allocation 102.20M > 100.08M").
``_plan`` now models that footprint and shrinks the row tile until it
fits; ``pallas_dcn_fits`` exposes the same check (plus a measured-win
shape heuristic) to the dispatch layer in ops/dcn.py so oversized layers
fall back to the banded/gather XLA paths instead of crashing the compile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Scoped-VMEM budget for the kernel. The pallas_call pins
# vmem_limit_bytes at 100MB; plan against 80MB so the empirical stack
# model below has 20% headroom (a wrong estimate degrades to a compile
# error in an isolated layer test, never a crash of the default path —
# the dispatch predicate uses the same plan).
_VMEM_LIMIT = 100 * 1024 * 1024
_VMEM_BUDGET = 80 * 1024 * 1024


def _vmem_bytes(th, w2, ci, co, kk, span, lo, hi, itemsize):
    """Estimated scoped-VMEM footprint of ``_fwd_kernel`` at this plan.

    Components XLA charges against ``vmem_limit_bytes``:
      * pipelined blocks (om in + out, double-buffered) and whole-array
        VMEM operands (w_taps, bias2, dys),
      * scratch (x_tile, col, acc),
      * Mosaic's STACK for the unrolled (tap x dy) loop temporaries —
        the term that blew up round 4. Calibrated on the observed
        failure: th=16, ci=512, co=256, span=10, bf16-pack reported
        102.20M total, i.e. ~84M stack ~= 20 live [th, ci, 128] f32
        buffers. Modeled as 2.2*span such buffers (scales with the
        unroll depth; ~10% conservative at the calibration point) plus
        2 [th, 128, co] f32 dot results.
    """
    blocks = 2 * th * 3 * kk * w2 * 4  # om (f32, double-buffered)
    blocks += 2 * th * w2 * co * 4  # out (f32, double-buffered)
    blocks += kk * ci * co * itemsize + th * w2 * co * 4 + span * w2 * 4
    scratch = (th + lo + hi) * ci * w2 * itemsize  # x_tile
    scratch += th * ci * w2 * 4  # col
    scratch += th * w2 * co * 4  # acc
    stack = int(2.2 * span) * th * ci * w2 * 4 + 2 * th * w2 * co * 4
    return blocks + scratch + stack


def _plan(h, w, ci, co, dtype, kk=9, radius=4, lo=None, hi=None):
    """Tile plan: largest row tile whose estimated scoped-VMEM footprint
    fits ``_VMEM_BUDGET``. Returns (th, w2, pack) or None if even th=1
    does not fit (callers then fall back to an XLA impl)."""
    w2 = 128  # lane width; callers guarantee w <= 128
    pack = dtype == jnp.bfloat16 and ci % 2 == 0
    span = 2 * radius + 1
    if lo is None:
        lo = 1 + radius  # padding + radius (3x3 pad-1 default)
    if hi is None:
        hi = 1 + radius
    itemsize = jnp.dtype(dtype).itemsize
    for cand in (16, 8, 4, 2, 1):
        if h % cand:
            continue
        if _vmem_bytes(cand, w2, ci, co, kk, span, lo, hi,
                       itemsize) <= _VMEM_BUDGET:
            return cand, w2, pack
    return None


def pallas_dcn_fits(h, w, ci, co, dtype, radius=4, kernel_size=3,
                    stride=1, padding=1, dilation=1):
    """True iff the Pallas forward can COMPILE at this layer shape
    (stride-1 same-size, single-vreg lane width, VMEM-fitting plan).

    This is the safety half of the dispatch decision; ops/dcn.py combines
    it with a measured-win heuristic (bench_dcn_pallas_sweep.py) to pick
    the per-layer eval impl."""
    if stride != 1 or w > 128:
        return False
    lo = padding + radius
    hi = (kernel_size - 1) * dilation - padding + radius
    if lo < 0 or hi < 0:
        return False
    return _plan(h, w, ci, co, jnp.dtype(dtype),
                 kk=kernel_size * kernel_size, radius=radius,
                 lo=lo, hi=hi) is not None


def _vmem_bytes_bwd(th, w2, ci, co, kk, span, lo, hi, itemsize):
    """Estimated scoped-VMEM footprint of ``_bwd_kernel`` at this plan.

    Same accounting as ``_vmem_bytes``: pipelined blocks, whole-array
    operands, scratch, plus Mosaic's stack for the unrolled
    (tap x dy [x shift]) loops. The backward keeps more live state per
    tap (gk, col/ux/uy accumulators, the rolled E_s planes) so the stack
    coefficient is larger; calibrated so the 128^2 C64 r=2 and
    64^2 C128 r=4 plans land at th=8 (measured compile-clean) and the
    Ci>=256 shapes fall back to the XLA backward."""
    rows = th + lo + hi
    blocks = 2 * th * 3 * kk * w2 * 4            # om in
    blocks += 2 * th * co * w2 * 4               # g in
    blocks += 2 * th * 3 * kk * w2 * 4           # dom out
    blocks += 2 * rows * ci * w2 * 4             # dx slab out
    blocks += kk * ci * co * (itemsize + 4 + 4)  # w_taps + dw out + dwacc
    blocks += span * w2 * 4                      # dys
    scratch = rows * ci * w2 * itemsize          # x_tile
    scratch += rows * ci * w2 * 4                # dxacc
    scratch += 4 * th * ci * w2 * 4              # col/ux/uy/gk
    stack = int(3.0 * span) * th * ci * w2 * 4 + (2 * span + 4) * th * w2 * 4
    return blocks + scratch + stack


def _plan_bwd(h, w, ci, co, dtype, kk=9, radius=4, lo=None, hi=None):
    """Backward tile plan (same contract as ``_plan``)."""
    w2 = 128
    pack = dtype == jnp.bfloat16 and ci % 2 == 0
    span = 2 * radius + 1
    if lo is None:
        lo = 1 + radius
    if hi is None:
        hi = 1 + radius
    itemsize = jnp.dtype(dtype).itemsize
    for cand in (16, 8, 4, 2, 1):
        if h % cand:
            continue
        if _vmem_bytes_bwd(cand, w2, ci, co, kk, span, lo, hi,
                           itemsize) <= _VMEM_BUDGET:
            return cand, w2, pack
    return None


def _bwd_ci_split(ci):
    """Channel-block width for the backward kernel, or None.

    A SINGLE kernel invocation is hard-capped at Ci<=128: the round-5
    on-chip sweep measured the 32^2 C256->128 r=4 plan (th=16, approved
    by the byte estimator at ~84M) actually compiling to 169.75M of
    scoped VMEM — 158M of it register-allocator SPILL slots the
    estimator's linear stack model cannot see — and taking ~15 min of
    Mosaic compile before aborting. But the backward is LINEAR in the
    channel blocks: gk/col/ux/uy/dx/dw all decompose over Ci, and the
    dty/dtx/dmask outputs are Ci-reductions that sum across blocks — so
    wide layers run as Ci/128 block calls of the verified 128-channel
    kernel (``pallas_deform_conv_bwd`` slices x and W_k per block and
    combines)."""
    if ci <= 128:
        return ci
    if ci % 128 == 0:
        return 128
    return None


def pallas_dcn_bwd_fits(h, w, ci, co, dtype, radius=4, kernel_size=3,
                        stride=1, padding=1, dilation=1):
    """True iff the Pallas backward can COMPILE at this layer shape
    (directly at Ci<=128, or as Ci/128 channel-block calls — see
    ``_bwd_ci_split`` for the measured spill-OOM rationale)."""
    cs = _bwd_ci_split(ci)
    if stride != 1 or w > 128 or cs is None:
        return False
    lo = padding + radius
    hi = (kernel_size - 1) * dilation - padding + radius
    if lo < 0 or hi < 0:
        return False
    return _plan_bwd(h, w, cs, co, jnp.dtype(dtype),
                     kk=kernel_size * kernel_size, radius=radius,
                     lo=lo, hi=hi) is not None


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
    span = 2 * r + 1
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
    span = 2 * r + 1  # tight: offsets clamped to [-r, r - CLIP_EPS]
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
    # Tight row-shift span 2r+1 (not 2r+2): the module clamps offsets to
    # [-r, r - CLIP_EPS] (ops/dcn.py), so floor(oy) <= r-1 and the
    # bilinear never touches row shift r+1 — same ~10-17% cut the banded
    # path took in round 3.
    lo = padding + radius
    hi = (kernel_size - 1) * dilation - padding + radius
    plan = _plan(h, w, ci, co, x.dtype, kk=kk, radius=radius, lo=lo, hi=hi)
    if plan is None:
        raise ValueError(
            f"pallas DCN does not fit VMEM at shape H{h} W{w} Ci{ci} "
            f"Co{co} r{radius}; gate dispatch on pallas_dcn_fits()"
        )
    th, w2, pack = plan

    xt = jnp.transpose(x, (0, 1, 3, 2))  # [B, H, C, W]
    xt = jnp.pad(xt, ((0, 0), (lo, hi), (0, 0), (0, w2 - w)))
    om = jnp.concatenate(
        [offsets.astype(jnp.float32), mask.astype(jnp.float32)], axis=-1)
    omt = jnp.pad(jnp.transpose(om, (0, 1, 3, 2)),
                  ((0, 0), (0, 0), (0, 0), (0, w2 - w)))
    w_taps = weight.reshape(kk, ci, co).astype(x.dtype)
    bias2 = jnp.broadcast_to(
        bias.astype(jnp.float32).reshape(1, 1, co), (th, w2, co))
    span = 2 * radius + 1
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


def _roll_lanes(v, s):
    """Static lane roll that works for bf16: Mosaic's rotate is 32-bit
    only, so bf16 tensors roll as bitcast i32 sublane-pairs (even
    second-to-last dim) or through an f32 round-trip otherwise."""
    if v.dtype == jnp.bfloat16:
        if v.shape[-2] % 2 == 0:
            p = pltpu.bitcast(v, jnp.int32)
            return pltpu.bitcast(pltpu.roll(p, s, axis=2), jnp.bfloat16)
        return pltpu.roll(v.astype(jnp.float32), s, axis=2).astype(
            jnp.bfloat16)
    return pltpu.roll(v, s, axis=2)


def _bwd_kernel(x_hbm, om_ref, g_ref, w_ref, dys_ref,
                dom_ref, dxs_ref, dw_ref,
                x_tile, dxacc, col_ref, ux_ref, uy_ref, gk_ref, dwacc, sem, *,
                th, w, w2, ci, co, ksize, pad, dil, r, lo, hi, pack, nb, nt):
    """Backward of the Pallas DCN forward (the train-step hot loop).

    Replaces the XLA hand-VJP's dominant cost — the per-(tap, dy) one-hot
    selection einsums and the [n_sy, B, H, WH, Ci] input-cotangent stack
    (BENCHMARKS.md round-4 train attribution: ~60% of the dla_34 step) —
    with the lane-gather formulation transposed in place:

      * the INPUT cotangent is the transpose of the forward's per-lane
        gather: each output position p writes its two bilinear corners at
        lanes x0(p) / x0(p)+1, i.e. lane displacement s = kx + floor(ox)
        ranging over a STATIC band of 2r+1 values.  Per (tap, shift s) the
        kernel rolls the coefficient-weighted cotangent plane by s once
        (E_s = roll(c_s * mk * gk, s)) and per row-shift dy adds
        roll(wy_dy, s) * E_s into the accumulation slab — pure static
        lane-rolls, no scatter. Corner validity already zeroes any lane
        that would wrap around the roll (an out-of-image target column has
        zero coefficient), so no extra edge masking is needed.
      * offset gradients are the reference CUDA kernel's forward
        difference (dmcn_get_coordinate_weight), computed exactly as the
        XLA hand VJP does: dfx contracts the corner difference
        (g1 - g0), dfy the indicator difference of adjacent row shifts,
        both against the masked cotangent gk*mk, reduced over Ci on the
        sublanes.
      * gk = W_k @ g and dW_k = col_k g^T ride per-plane MXU dots.
      * dW accumulates in a VMEM scratch across the sequential grid and
        flushes on the final grid step (dbias is one XLA reduction over g
        outside).

    The per-row-tile input-cotangent slabs [rows, Ci, w2] (rows = th+lo+hi)
    overlap between adjacent tiles by lo+hi rows; they are emitted stacked
    and folded by ``pallas_deform_conv_bwd`` outside (T dynamic-slice adds
    — the same fold the XLA VJP does over its n_sy stack).
    """
    bi = pl.program_id(0)
    t = pl.program_id(1)
    rows = th + lo + hi
    copy = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(t * th, rows)], x_tile, sem)
    copy.start()

    kk = ksize * ksize
    span = 2 * r + 1
    dt = x_tile.dtype
    f32 = jnp.float32
    lanes = jax.lax.broadcasted_iota(jnp.int32, (th, 1, w2), 2)
    om = om_ref[0]          # [th, 3kk, w2] f32
    g_t = g_ref[0]          # [th, co, w2] f32
    dys = dys_ref[...][None]  # [1, span, w2]

    @pl.when((bi == 0) & (t == 0))
    def _init_dw():
        dwacc[...] = jnp.zeros_like(dwacc)

    copy.wait()
    dxacc[...] = jnp.zeros_like(dxacc)
    gd = g_t.astype(dt)

    for k in range(kk):
        ky = (k // ksize) * dil - pad
        kx = (k % ksize) * dil - pad
        oy = jnp.clip(om[:, 2 * k:2 * k + 1, :], -float(r), float(r))
        ox = jnp.clip(om[:, 2 * k + 1:2 * k + 2, :], -float(r), float(r))
        mk = om[:, 2 * kk + k:2 * kk + k + 1, :]
        oxf = jnp.floor(ox)
        fx = ox - oxf
        oyf = jnp.floor(oy)
        x0 = lanes + kx + oxf.astype(jnp.int32)
        v0 = (x0 >= 0) & (x0 <= w - 1)
        v1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
        i0 = jnp.clip(x0, 0, w2 - 1)
        i1 = jnp.clip(x0 + 1, 0, w2 - 1)
        c0 = jnp.where(v0, 1.0, 0.0)
        c1 = jnp.where(v1, 1.0, 0.0)
        b0 = (c0 * (1.0 - fx)).astype(dt)   # corner-0 coeff (unmasked)
        b1 = (c1 * fx).astype(dt)           # corner-1 coeff (unmasked)
        c0 = c0.astype(dt)
        c1 = c1.astype(dt)
        # y-bilinear weights and their indicator difference over all span
        # row shifts (floor form — matches the XLA VJP / reference CUDA
        # forward-difference coordinate gradient)
        wy_all = (
            jnp.where(oyf == dys, 1.0 - (oy - oyf), 0.0)
            + jnp.where(oyf == dys - 1.0, oy - oyf, 0.0)
        ).astype(dt)                         # [th, span, w2]
        iy_all = (
            jnp.where(oyf == dys - 1.0, 1.0, 0.0)
            - jnp.where(oyf == dys, 1.0, 0.0)
        ).astype(dt)
        rowsidx = ci // 2 if pack else ci
        idx0 = jnp.broadcast_to(i0, (th, rowsidx, w2)).reshape(
            th * rowsidx, w2)
        idx1 = jnp.broadcast_to(i1, (th, rowsidx, w2)).reshape(
            th * rowsidx, w2)

        # gk = W_k @ g per plane (co contraction on the MXU)
        for i in range(th):
            gk_ref[i] = jax.lax.dot_general(
                w_ref[k], gd[i],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=(jax.lax.Precision.HIGHEST
                           if dt == jnp.float32 else None))
        gkd = (gk_ref[...] * mk).astype(dt)  # masked cotangent, [th,ci,w2]

        # E_s: rolled coefficient-weighted cotangent, one per lane shift
        e_s = []
        for s in range(kx - r, kx + r + 1):
            cs = (
                jnp.where(oxf == float(s - kx), b0, 0.0)
                + jnp.where(oxf == float(s - 1 - kx), b1, 0.0)
            )
            e_s.append(_roll_lanes(cs * gkd, s % w2))
        wyr = [_roll_lanes(wy_all, s % w2)
               for s in range(kx - r, kx + r + 1)]

        col_ref[...] = jnp.zeros_like(col_ref)
        ux_ref[...] = jnp.zeros_like(ux_ref)
        uy_ref[...] = jnp.zeros_like(uy_ref)
        for dy in range(span):
            sy = ky - r + dy
            g0, g1 = _gather_corners(
                x_tile, lo, sy, th, ci, pack, idx0, idx1)
            tdy = b0 * g0 + b1 * g1             # bilinear-x sample, [th,ci,w2]
            wy = wy_all[:, dy:dy + 1, :]
            iy = iy_all[:, dy:dy + 1, :]
            col_ref[...] += (wy * tdy).astype(f32)
            ux_ref[...] += (wy * (c1 * g1 - c0 * g0)).astype(f32)
            uy_ref[...] += (iy * tdy).astype(f32)
            # input cotangent: dx[p + s] += wy(p) * c_s(p) * mk*gk(p)
            for j in range(2 * r + 1):
                dxacc[lo + sy:lo + sy + th] += (
                    wyr[j][:, dy:dy + 1, :] * e_s[j]).astype(f32)

        gk32 = gk_ref[...]
        dcol32 = gk32 * mk
        dom_ref[0, :, k:k + 1, :] = jnp.sum(
            uy_ref[...] * dcol32, axis=1, keepdims=True)            # dty
        dom_ref[0, :, kk + k:kk + k + 1, :] = jnp.sum(
            ux_ref[...] * dcol32, axis=1, keepdims=True)            # dtx
        dom_ref[0, :, 2 * kk + k:2 * kk + k + 1, :] = jnp.sum(
            col_ref[...] * gk32, axis=1, keepdims=True)             # dmask
        colm = (col_ref[...] * mk).astype(dt)
        for i in range(th):
            dwacc[k] += jax.lax.dot_general(
                colm[i], gd[i],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=(jax.lax.Precision.HIGHEST
                           if dt == jnp.float32 else None))

    dxs_ref[0, 0] = dxacc[...]

    @pl.when((bi == nb - 1) & (t == nt - 1))
    def _flush_dw():
        dw_ref[...] = dwacc[...]


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "stride", "padding", "dilation", "radius"),
)
def pallas_deform_conv_bwd(x, offsets, mask, weight, g, kernel_size=3,
                           stride=1, padding=1, dilation=1, radius=4):
    """Gather-transpose Pallas DCN backward.

    Args mirror the forward (offsets CLAMPED, [B,H,W,2KK] interleaved
    (dy, dx) per tap; mask post-sigmoid) plus the output cotangent
    g [B,H,W,Co] (f32 — the banded forward returns f32).

    Returns ``(dx, dty, dtx, dmask, dw)``: input cotangent [B,H,W,Ci] in
    x.dtype, per-tap offset gradients [B,H,W,KK] f32 (pre clip
    pass-through — the caller applies it, ops/dcn.py `_banded_vjp_bwd`),
    mask gradient [B,H,W,KK] f32, and weight gradient [KK*Ci, Co] f32.
    dbias = sum(g) stays outside (one XLA reduction).

    Layers wider than 128 input channels run as Ci/128 channel-block
    calls of the single-block kernel (the backward is linear in the
    blocks — ``_bwd_ci_split``): dx/dw concatenate, dty/dtx/dmask sum.
    """
    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    co = weight.shape[-1]
    cs = _bwd_ci_split(ci)
    assert cs is not None, f"Ci {ci} not expressible as 128-channel blocks"
    if cs != ci:
        w_taps = weight.reshape(kk, ci, co)
        dty = dtx = dmask = None
        dx_parts, dw_parts = [], []
        for i in range(ci // cs):
            wi = w_taps[:, i * cs:(i + 1) * cs, :].reshape(kk * cs, co)
            dxi, tyi, txi, dmi, dwi = _pallas_bwd_single(
                x[..., i * cs:(i + 1) * cs], offsets, mask, wi, g,
                kernel_size, stride, padding, dilation, radius)
            dx_parts.append(dxi)
            dw_parts.append(dwi.reshape(kk, cs, co))
            dty = tyi if dty is None else dty + tyi
            dtx = txi if dtx is None else dtx + txi
            dmask = dmi if dmask is None else dmask + dmi
        dx = jnp.concatenate(dx_parts, axis=-1)
        dw = jnp.concatenate(dw_parts, axis=1).reshape(kk * ci, co)
        return dx, dty, dtx, dmask, dw
    return _pallas_bwd_single(x, offsets, mask, weight, g, kernel_size,
                              stride, padding, dilation, radius)


def _pallas_bwd_single(x, offsets, mask, weight, g, kernel_size, stride,
                       padding, dilation, radius):
    """One Ci<=128 block of the backward (see pallas_deform_conv_bwd)."""
    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    co = weight.shape[-1]
    assert stride == 1, "pallas DCN supports stride-1 same-size"
    assert w <= 128, "pallas DCN requires feature width <= 128"
    lo = padding + radius
    hi = (kernel_size - 1) * dilation - padding + radius
    plan = _plan_bwd(h, w, ci, co, x.dtype, kk=kk, radius=radius,
                     lo=lo, hi=hi)
    if plan is None:
        raise ValueError(
            f"pallas DCN backward does not fit VMEM at shape H{h} W{w} "
            f"Ci{ci} Co{co} r{radius}; gate dispatch on pallas_dcn_bwd_fits()"
        )
    th, w2, pack = plan
    rows = th + lo + hi
    nt = h // th

    xt = jnp.transpose(x, (0, 1, 3, 2))  # [B, H, C, W]
    xt = jnp.pad(xt, ((0, 0), (lo, hi), (0, 0), (0, w2 - w)))
    om = jnp.concatenate(
        [offsets.astype(jnp.float32), mask.astype(jnp.float32)], axis=-1)
    omt = jnp.pad(jnp.transpose(om, (0, 1, 3, 2)),
                  ((0, 0), (0, 0), (0, 0), (0, w2 - w)))
    gt = jnp.pad(jnp.transpose(g.astype(jnp.float32), (0, 1, 3, 2)),
                 ((0, 0), (0, 0), (0, 0), (0, w2 - w)))
    w_taps = weight.reshape(kk, ci, co).astype(x.dtype)
    span = 2 * radius + 1
    dys = jnp.broadcast_to(
        (jnp.arange(span, dtype=jnp.float32) - float(radius))[:, None],
        (span, w2),
    )

    kernel = functools.partial(
        _bwd_kernel, th=th, w=w, w2=w2, ci=ci, co=co, ksize=kernel_size,
        pad=padding, dil=dilation, r=radius, lo=lo, hi=hi, pack=pack,
        nb=b, nt=nt)
    dom, dxs, dw = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, th, 3 * kk, w2), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, co, w2), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, 3 * kk, w2), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, ci, w2),
                         lambda bi, ti: (bi, ti, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, ci, co), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, 3 * kk, w2), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, rows, ci, w2), jnp.float32),
            jax.ShapeDtypeStruct((kk, ci, co), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, ci, w2), x.dtype),     # x_tile
            pltpu.VMEM((rows, ci, w2), jnp.float32),  # dxacc
            pltpu.VMEM((th, ci, w2), jnp.float32),    # col
            pltpu.VMEM((th, ci, w2), jnp.float32),    # ux
            pltpu.VMEM((th, ci, w2), jnp.float32),    # uy
            pltpu.VMEM((th, ci, w2), jnp.float32),    # gk
            pltpu.VMEM((kk, ci, co), jnp.float32),    # dw accumulator
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xt, omt, gt, w_taps, dys)

    # fold the overlapping per-tile slabs back onto the padded canvas
    dxpad = jnp.zeros((b, h + lo + hi, ci, w2), jnp.float32)
    for ti in range(nt):
        dxpad = dxpad.at[:, ti * th:ti * th + rows].add(dxs[:, ti])
    dx = jnp.transpose(dxpad[:, lo:lo + h, :, :w], (0, 1, 3, 2))
    dx = dx.astype(x.dtype)

    domo = jnp.transpose(dom[:, :, :, :w], (0, 1, 3, 2))  # [B,H,W,3KK]
    dty = domo[..., :kk]
    dtx = domo[..., kk:2 * kk]
    dmask = domo[..., 2 * kk:]
    return dx, dty, dtx, dmask, dw.reshape(kk * ci, co)
