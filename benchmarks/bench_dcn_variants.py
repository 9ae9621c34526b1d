"""Isolated DCN-layer variant shootout on the real chip (bf16).

Round-3 attack on the banded formulation's HBM traffic (VERDICT item 1):
the round-2 kernel re-reads the [B,H,W,WH] one-hot selection tensor once
per row-shift (10x at r=4) and pads the WH contraction to two MXU tiles.

Variants measured here (single-call scalar-fetch + batch differencing —
the only valid timing on the async tunnel, see BENCHMARKS.md):

* banded      — round-2 baseline (ops.dcn.banded_deform_conv, unrolled)
* banded_f    — ONE dot per tap: row-shift axis stacked into the rhs
                ([B,H,Q,S*C]), one-hot read once, wy folded in afterwards
* banded_g    — W chunked into tiles with +-(r+k) halos so the contraction
                fits ONE 128-lane MXU tile (Q: 139->pad 256 becomes
                75->pad 128 per tile)
* banded_fg   — both
* window      — ops.dcn.window_deform_conv (one [8,8,C] gather per output
                position + one-hot MXU readout)
* gather      — exact dcn_v2 (per-tap corner gathers)

Run: python benchmarks/bench_dcn_variants.py [--scale 128] [--reps 5]
Also: --probe-gather  (gather throughput vs slice size: settles whether
TPU gather cost is index-rate-bound or bytes-bound — decides the window
formulation's fate)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def banded_v3(
    x, offsets, mask, weight, bias,
    kernel_size=3, padding=1, dilation=1, radius=4,
    stack_dy=True, chunk=0,
):
    """Variant family: stacked-dy single-dot per tap (stack_dy) and/or
    W-chunking (chunk = tile width; 0 = off). Inference-oriented (taps
    unrolled), same clamped-banded numerics contract as banded_deform_conv.
    """
    import jax
    import jax.numpy as jnp

    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    co = weight.shape[-1]
    r = radius
    span = 2 * r + 2
    lo = padding + r
    hi = (kernel_size - 1) * dilation - padding + r + 1
    dt = x.dtype
    xpad = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    w_taps = weight.reshape(kk, ci, co).astype(dt)
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    off = jnp.clip(
        offsets.reshape(b, h, w, kk, 2).astype(jnp.float32), -r, r
    )
    sy_min = -padding - r
    sy_max = (kernel_size - 1) * dilation - padding + r + 1
    n_sy = sy_max - sy_min + 1

    if chunk:
        assert w % chunk == 0
        n_ch = w // chunk
    else:
        n_ch = 1
    # halo width for a tile of T outputs: [w0, w0 + T + 2r + (k-1)d]
    qw = (w // n_ch) + 2 * r + (kernel_size - 1) * dilation + 1

    out = jnp.zeros((b, h, w, co), jnp.float32)

    if stack_dy:
        # [B, H, QW(all), n_sy, C] stacked row shifts, built once: element
        # (b, y, q, s, c) = xpad[b, y + s, q, c]
        rows = jnp.stack(
            [xpad[:, s : s + h, :, :] for s in range(n_sy)], axis=3
        )  # [B, H, WHfull, n_sy, C]

    for k in range(kk):
        ky = (k // kernel_size) * dilation - padding
        kx = (k % kernel_size) * dilation - padding
        oy = off[:, :, :, k, 0]
        ox = off[:, :, :, k, 1]
        oxf = jnp.floor(ox)
        fx = (ox - oxf).astype(dt)
        oyf = jnp.floor(oy)
        fy = oy - oyf
        base = ky - r - sy_min

        # per-chunk x one-hot + contraction
        col = jnp.zeros((b, h, w, ci), jnp.float32)
        cols = []
        for c in range(n_ch):
            w0 = c * (w // n_ch)
            wc = w // n_ch
            px = jnp.arange(wc, dtype=jnp.int32)
            qx = jnp.arange(qw, dtype=jnp.int32)
            # halo-local column of the floor corner for outputs [w0, w0+wc)
            x0 = (
                px[None, None, :]
                + (kx + r + padding)
                + oxf[:, :, w0 : w0 + wc].astype(jnp.int32)
            )
            mx = jnp.where(
                qx == x0[..., None], (1.0 - fx[:, :, w0 : w0 + wc])[..., None], 0.0
            ) + jnp.where(qx == x0[..., None] + 1, fx[:, :, w0 : w0 + wc][..., None], 0.0)
            mx = mx.astype(dt)

            if stack_dy:
                rwin = jax.lax.dynamic_slice(
                    rows,
                    (0, 0, w0, base, 0),
                    (b, h, qw, span, ci),
                ).reshape(b, h, qw, span * ci)
                t = jnp.einsum(
                    "bhwq,bhqz->bhwz", mx, rwin,
                    preferred_element_type=jnp.float32, precision=prec,
                ).reshape(b, h, wc, span, ci)
                wy = (
                    jnp.where(
                        oyf[:, :, w0 : w0 + wc, None]
                        == (jnp.arange(span, dtype=jnp.float32) - r),
                        1.0 - fy[:, :, w0 : w0 + wc, None],
                        0.0,
                    )
                    + jnp.where(
                        oyf[:, :, w0 : w0 + wc, None]
                        == (jnp.arange(span, dtype=jnp.float32) - r - 1.0),
                        fy[:, :, w0 : w0 + wc, None],
                        0.0,
                    )
                )
                c_out = jnp.einsum(
                    "bhwsc,bhws->bhwc", t, wy.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
            else:
                c_out = jnp.zeros((b, h, wc, ci), jnp.float32)
                for dy in range(span):
                    sy = ky - r + dy
                    xrows = jax.lax.dynamic_slice(
                        xpad, (0, lo + sy, w0, 0), (b, h, qw, ci)
                    )
                    t_dy = jnp.einsum(
                        "bhwq,bhqc->bhwc", mx, xrows,
                        preferred_element_type=jnp.float32, precision=prec,
                    )
                    s_rel = float(dy - r)
                    wy = jnp.where(
                        oyf[:, :, w0 : w0 + wc] == s_rel,
                        1.0 - fy[:, :, w0 : w0 + wc],
                        0.0,
                    ) + jnp.where(
                        oyf[:, :, w0 : w0 + wc] == s_rel - 1.0,
                        fy[:, :, w0 : w0 + wc],
                        0.0,
                    )
                    c_out = c_out + wy[..., None] * t_dy
            cols.append(c_out)
        col = cols[0] if n_ch == 1 else jnp.concatenate(cols, axis=2)
        colm = (col * mask[:, :, :, k, None]).astype(dt)
        out = out + jnp.einsum(
            "bhwc,co->bhwo", colm, w_taps[k],
            preferred_element_type=jnp.float32, precision=prec,
        )
    return out + bias


def banded_v4(
    x, offsets, mask, weight, bias,
    kernel_size=3, padding=1, dilation=1, radius=4,
    group=2, tight_clip=False,
):
    """Round-3 variant: dy shifts contracted in GROUPS stacked on the rhs
    CHANNEL axis (N = group*C fills the 128 MXU lanes; group=1 == the
    baseline shape), with the group's wy weights applied in a small fused
    epilogue.  Unlike banded_f there is no [B,H,Q,S,C] mega-window: the rhs
    for a group is a dynamic slice of a once-built consecutive-pair stack,
    so no per-tap materialization.  ``tight_clip`` clips offsets to
    [-r, r - 1/64] so floor(off) never reaches +r and the dy span shrinks
    (2r+2) -> (2r+1); offsets that sat exactly at +r move by 1/64 cell.
    """
    import jax
    import jax.numpy as jnp

    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    co = weight.shape[-1]
    r = radius
    span = (2 * r + 1) if tight_clip else (2 * r + 2)
    lo = padding + r
    hi = (kernel_size - 1) * dilation - padding + r + 1
    wh = w + lo + hi
    dt = x.dtype
    xpad = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    w_taps = weight.reshape(kk, ci, co).astype(dt)
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    hi_clip = (r - 1.0 / 64.0) if tight_clip else float(r)
    off = jnp.clip(
        offsets.reshape(b, h, w, kk, 2).astype(jnp.float32), -r, hi_clip
    )
    sy_min = -padding - r
    sy_max = (kernel_size - 1) * dilation - padding + r + 1
    n_sy = sy_max - sy_min + 1
    # consecutive GROUPS of row shifts stacked on channels, built once:
    # grp_all[s] = concat(rows[s], rows[s+1], ..., rows[s+group-1], ch axis)
    rows = [
        jax.lax.dynamic_slice(xpad, (0, lo + sy, 0, 0), (b, h, wh, ci))
        for sy in range(sy_min, sy_max + 1)
    ]
    # pad with zero rows so every group START (incl. short tail groups,
    # whose trailing channels are sliced off) indexes in range
    rows += [jnp.zeros_like(rows[0])] * (group - 1)
    grp_all = jnp.stack(
        [
            jnp.concatenate(rows[s : s + group], axis=-1)
            for s in range(n_sy)
        ]
    )  # [n_sy, B, H, WH, group*Ci]

    qx = jnp.arange(wh, dtype=jnp.int32)
    px = jnp.arange(w, dtype=jnp.int32)
    out = jnp.zeros((b, h, w, co), jnp.float32)
    n_groups = -(-span // group)  # ceil

    for k in range(kk):
        ky = (k // kernel_size) * dilation - padding
        kx = (k % kernel_size) * dilation - padding
        oy = off[:, :, :, k, 0]
        ox = off[:, :, :, k, 1]
        oxf = jnp.floor(ox)
        fx = (ox - oxf).astype(dt)
        oyf = jnp.floor(oy)
        fy = oy - oyf
        x0 = px[None, None, :] + (kx + lo) + oxf.astype(jnp.int32)
        mx = jnp.where(qx == x0[..., None], (1.0 - fx)[..., None], 0.0) + \
            jnp.where(qx == x0[..., None] + 1, fx[..., None], 0.0)
        mx = mx.astype(dt)
        base = ky - r - sy_min

        col = jnp.zeros((b, h, w, ci), jnp.float32)
        for g in range(n_groups):
            d0 = g * group
            gsz = min(group, span - d0)
            start = base + d0
            if gsz == group:
                rhs = jax.lax.dynamic_index_in_dim(
                    grp_all, start, axis=0, keepdims=False
                )
            else:  # tail group smaller than `group`
                rhs = jax.lax.dynamic_index_in_dim(
                    grp_all, start, axis=0, keepdims=False
                )[..., : gsz * ci]
            t = jnp.einsum(
                "bhwq,bhqz->bhwz", mx, rhs,
                preferred_element_type=jnp.float32, precision=prec,
            )  # [B, H, W, gsz*Ci]
            for j in range(gsz):
                s_rel = float(d0 + j - r)
                wy = (
                    jnp.where(oyf == s_rel, 1.0 - fy, 0.0)
                    + jnp.where(oyf == s_rel - 1.0, fy, 0.0)
                )
                col = col + wy[..., None] * t[..., j * ci : (j + 1) * ci]
        colm = (col * mask[:, :, :, k, None]).astype(dt)
        out = out + jnp.einsum(
            "bhwc,co->bhwo", colm, w_taps[k],
            preferred_element_type=jnp.float32, precision=prec,
        )
    return out + bias


def banded_v5(
    x, offsets, mask, weight, bias,
    kernel_size=3, padding=1, dilation=1, radius=4,
):
    """Round-3 variant: JOINT (dy, q) contraction — wy folded into the
    one-hot so each tap is ONE dot with K = span*WH (fewer padded K passes
    than span separate K=WH dots) at the price of a [B,H,W,span*WH] lhs.
    Tests whether XLA fuses the one-hot generation into the dot's lhs read
    (if it materializes, HBM traffic kills it — that is the measurement).
    """
    import jax
    import jax.numpy as jnp

    b, h, w, ci = x.shape
    kk = kernel_size * kernel_size
    co = weight.shape[-1]
    r = radius
    span = 2 * r + 2
    lo = padding + r
    hi = (kernel_size - 1) * dilation - padding + r + 1
    wh = w + lo + hi
    dt = x.dtype
    xpad = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    w_taps = weight.reshape(kk, ci, co).astype(dt)
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    off = jnp.clip(
        offsets.reshape(b, h, w, kk, 2).astype(jnp.float32), -r, r
    )
    sy_min = -padding - r
    sy_max = (kernel_size - 1) * dilation - padding + r + 1

    qx = jnp.arange(wh, dtype=jnp.int32)
    px = jnp.arange(w, dtype=jnp.int32)
    srel = jnp.arange(span, dtype=jnp.float32) - r  # [S]
    out = jnp.zeros((b, h, w, co), jnp.float32)

    for k in range(kk):
        ky = (k // kernel_size) * dilation - padding
        kx = (k % kernel_size) * dilation - padding
        oy = off[:, :, :, k, 0]
        ox = off[:, :, :, k, 1]
        oxf = jnp.floor(ox)
        fx = (ox - oxf).astype(dt)
        oyf = jnp.floor(oy)
        fy = oy - oyf
        x0 = px[None, None, :] + (kx + lo) + oxf.astype(jnp.int32)
        mx = jnp.where(qx == x0[..., None], (1.0 - fx)[..., None], 0.0) + \
            jnp.where(qx == x0[..., None] + 1, fx[..., None], 0.0)
        # [B,H,W,S] y-bilinear weights
        wy = (
            jnp.where(oyf[..., None] == srel, (1.0 - fy)[..., None], 0.0)
            + jnp.where(oyf[..., None] == srel - 1.0, fy[..., None], 0.0)
        )
        # joint lhs [B,H,W,S*WH] = wy (x) mx
        lhs = (wy[..., :, None] * mx[..., None, :]).reshape(
            b, h, w, span * wh
        ).astype(dt)
        base = ky - r - sy_min
        rhs = jnp.stack(
            [
                jax.lax.dynamic_slice(
                    xpad, (0, lo + (ky - r + d), 0, 0), (b, h, wh, ci)
                )
                for d in range(span)
            ],
            axis=2,
        ).reshape(b, h, span * wh, ci)
        del base
        col = jnp.einsum(
            "bhwq,bhqc->bhwc", lhs, rhs,
            preferred_element_type=jnp.float32, precision=prec,
        )
        colm = (col * mask[:, :, :, k, None]).astype(dt)
        out = out + jnp.einsum(
            "bhwc,co->bhwo", colm, w_taps[k],
            preferred_element_type=jnp.float32, precision=prec,
        )
    return out + bias


def probe_gather(reps=5):
    """Gather cost vs slice size: [s, s, C] blocks at fixed index count."""
    import jax
    import jax.numpy as jnp
    from centernet_tpu.ops.dcn import _GATHER_DNUMS

    b, h, w, ci = 8, 128, 128, 64
    n = h * w
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h + 16, w + 16, ci)), jnp.bfloat16)
    starts = jnp.asarray(
        rng.integers(0, h, (b, n, 2)).astype(np.int32)
    )

    for s in (1, 2, 4, 8):
        def run(xx, st):
            def g1(xp, stt):
                return jax.lax.gather(
                    xp, stt, _GATHER_DNUMS, slice_sizes=(s, s, ci),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                )
            out = jax.vmap(g1)(xx, st)
            return jnp.sum(out.astype(jnp.float32))

        f = jax.jit(run)
        _ = np.asarray(f(x, starts))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(f(x, starts))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        byts = b * n * s * s * ci * 2
        print(
            f"slice {s}x{s}x{ci}: {t*1e3:.2f} ms for {b*n} idx "
            f"({t/(b*n)*1e9:.1f} ns/idx, {byts/t/1e9:.1f} GB/s)"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=128)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--co", type=int, default=0,
                    help="output channels (0 = same as --channels); "
                    "ci > co exercises the channel-folded banded form")
    ap.add_argument("--b1", type=int, default=4)
    ap.add_argument("--b2", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--radius", type=int, default=4)
    ap.add_argument("--probe-gather", action="store_true")
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated variant names to run")
    ap.add_argument("--check", action="store_true",
                    help="numerics check vs baseline banded (run on CPU)")
    ap.add_argument("--train", action="store_true",
                    help="time fwd+bwd via jax.grad instead of fwd")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/centernet_tpu_jax_cache_bench"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    if args.probe_gather:
        probe_gather(args.reps)
        return

    from centernet_tpu.ops.dcn import (
        banded_deform_conv,
        dcn_v2,
        window_deform_conv,
    )

    hw, ci = args.scale, args.channels
    co = args.co or ci
    kk = 9
    r = args.radius
    rng = np.random.default_rng(0)

    def inputs(b):
        x = jnp.asarray(rng.standard_normal((b, hw, hw, ci)), jnp.bfloat16)
        off = jnp.asarray(
            rng.uniform(-3.5, 3.5, (b, hw, hw, 2 * kk)), jnp.float32
        )
        m = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, kk)), jnp.float32)
        wgt = jnp.asarray(
            rng.standard_normal((kk * ci, co)) * 0.05, jnp.float32
        )
        bias = jnp.zeros((co,), jnp.float32)
        return x, off, m, wgt, bias

    variants = {
        "banded": functools.partial(
            banded_deform_conv, radius=r, unroll_taps=True
        ),
        "banded_acc": functools.partial(
            banded_deform_conv, radius=r, unroll_taps=True, acc32=False
        ),
        "banded_f": functools.partial(
            banded_v3, radius=r, stack_dy=True, chunk=0
        ),
        "banded_g": functools.partial(
            banded_v3, radius=r, stack_dy=False, chunk=64
        ),
        "banded_fg": functools.partial(
            banded_v3, radius=r, stack_dy=True, chunk=64
        ),
        "pair2": functools.partial(banded_v4, radius=r, group=2),
        "pair2t": functools.partial(
            banded_v4, radius=r, group=2, tight_clip=True
        ),
        "pair4": functools.partial(banded_v4, radius=r, group=4),
        "pair1t": functools.partial(
            banded_v4, radius=r, group=1, tight_clip=True
        ),
        "jointk": functools.partial(banded_v5, radius=r),
        "window": window_deform_conv,
        "gather": dcn_v2,
        "gather_u": functools.partial(dcn_v2, tap_mode="unroll"),
        "gather_1": functools.partial(dcn_v2, tap_mode="fused"),
    }
    if args.only:
        keep = args.only.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    if args.check:
        # small-shape f32 numerics check vs the shipped banded kernel
        # (tight_clip variants differ only for offsets in [r-1/64, r]: the
        # generator below avoids that band so equality is exact-contract)
        b, s, c = 2, 12, 8
        x = jnp.asarray(rng.standard_normal((b, s, s, c)), jnp.float32)
        offv = rng.uniform(-3.5, 3.5, (b, s, s, 2 * kk))
        offv = np.where(np.abs(offv) > r - 0.1, r - 0.2, offv)
        offv = jnp.asarray(offv, jnp.float32)
        m = jnp.asarray(rng.uniform(0, 1, (b, s, s, kk)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((kk * c, c)) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        ref = np.asarray(
            banded_deform_conv(x, offv, m, wgt, bias, radius=r,
                               unroll_taps=True)
        )
        for name, fn in variants.items():
            if name in ("window", "gather", "banded",
                        "banded_g", "banded_fg"):
                continue  # gather exact-vs-clamped / chunk needs w%64==0
            got = np.asarray(fn(x, offv, m, wgt, bias))
            err = np.abs(got - ref).max()
            print(f"{name:10s} max |delta| vs banded: {err:.2e}"
                  f" {'OK' if err < 1e-4 else 'MISMATCH'}")
        return

    for name, fn in variants.items():
        if args.train:
            def run(x, off, m, wgt, bias, fn=fn):
                def loss(x, off, m, wgt):
                    return jnp.sum(fn(x, off, m, wgt, bias))
                gs = jax.grad(loss, argnums=(0, 1, 2, 3))(x, off, m, wgt)
                return sum(jnp.sum(g.astype(jnp.float32)) for g in gs)
        else:
            def run(x, off, m, wgt, bias, fn=fn):
                return jnp.sum(fn(x, off, m, wgt, bias).astype(jnp.float32))
        f = jax.jit(run)

        def timed(b):
            arrs = inputs(b)
            _ = np.asarray(f(*arrs))
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                _ = np.asarray(f(*arrs))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        try:
            t1 = timed(args.b1)
            t2 = timed(args.b2)
            per_img = (t2 - t1) / (args.b2 - args.b1)
            print(
                f"{name:10s} {hw}^2 C{ci} r={r} "
                f"{'fwd+bwd' if args.train else 'fwd'}: "
                f"{per_img*1e3:.3f} ms/img"
            )
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
