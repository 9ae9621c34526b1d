"""Per-shape shootout of the DCN TRAIN path (fwd+bwd) at every distinct
dla_34 DCN layer shape: XLA hand-VJP backward vs the round-5 Pallas
gather-transpose backward (ops/dcn_pallas.py `pallas_deform_conv_bwd`).

The round-4 train attribution pinned ~60% of the dla_34 512^2 step on the
hand VJP's per-(tap, dy) one-hot einsum transposes; this sweep decides the
per-shape backward dispatch (`_pallas_bwd_wins` in ops/dcn.py).

Timing: chained dependent value_and_grad calls inside one jit, scalar
fetch, marginal per-call = (t(2N) - t(N)) / N — same protocol as
bench_dcn_pallas_sweep.py (the tunnel makes naive timing meaningless,
BENCHMARKS.md "Measurement methodology").

Run on a TPU host:  python benchmarks/bench_dcn_bwd_sweep.py [start [stop]]
(the optional argv pair slices SHAPES — Mosaic compiles via the tunnel
are minutes per shape, so target the rows you need)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = 8
# (H, W, Ci, Co, radius, count_in_dla34) — mirror of bench_dcn_pallas_sweep
SHAPES = [
    (128, 128, 64, 64, 2, 5),
    (64, 64, 128, 64, 4, 4),
    (64, 64, 128, 128, 4, 2),
    (32, 32, 256, 128, 4, 2),
    (32, 32, 256, 256, 4, 1),
    (32, 32, 256, 64, 4, 1),
    (16, 16, 512, 256, 4, 1),
]


def main():
    import jax
    import jax.numpy as jnp

    from centernet_tpu.ops.dcn import CLIP_EPS, banded_deform_conv_vjp
    from centernet_tpu.ops.dcn_pallas import pallas_dcn_bwd_fits

    print(f"devices: {jax.devices()}", flush=True)

    def chain(r, n):
        # grad wrt ALL five inputs: the train step needs every cotangent,
        # and anything less lets XLA dead-code-eliminate most of the hand
        # VJP (measured 10x "speedup" from pruning doff/dmask/dw) while
        # the opaque Pallas kernel always computes everything.
        def f(x, off, mask, wgt, bias, g):
            def loss(x, off, mask, wgt, bias):
                out = banded_deform_conv_vjp(
                    x, off, mask, wgt, bias, 3, 1, 1, 1, r, True)
                return jnp.sum(out * g)

            grad = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))
            acc = jnp.zeros((), jnp.float32)
            y = x
            for _ in range(n):
                v, gs = grad(y, off, mask, wgt, bias)
                acc = (acc + v
                       + sum(jnp.sum(t[..., :1].astype(jnp.float32))
                             for t in gs))
                y = x * (1 + 1e-6 * acc.astype(x.dtype))
            return acc
        return f

    def measure(r, args, env, n=3, reps=5):
        os.environ["CENTERNET_TPU_DCN_BWD_PALLAS"] = env
        # fresh jits per env value (the dispatch reads env at trace time)
        f1 = jax.jit(chain(r, n))
        f2 = jax.jit(chain(r, 2 * n))
        float(f1(*args)), float(f2(*args))
        t1 = min(
            (lambda t0: (float(f1(*args)), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(reps))
        t2 = min(
            (lambda t0: (float(f2(*args)), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(reps))
        return (t2 - t1) / n

    shapes = SHAPES[
        int(sys.argv[1]) if len(sys.argv) > 1 else 0:
        int(sys.argv[2]) if len(sys.argv) > 2 else len(SHAPES)]
    totals = {"xla": 0.0, "pallas": 0.0, "best": 0.0}
    print(f"{'shape':28s} {'xla ms':>8s} {'pallas ms':>10s} {'ratio':>6s}")
    for h, w, ci, co, r, cnt in shapes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, h, w, ci)), jnp.bfloat16)
        off = jnp.asarray(
            np.clip(rng.uniform(-r - 1, r + 1, (B, h, w, 18)), -r,
                    r - CLIP_EPS), jnp.float32)
        mask = jnp.asarray(rng.uniform(0, 1, (B, h, w, 9)), jnp.float32)
        wgt = jnp.asarray(
            rng.standard_normal((9 * ci, co)) / np.sqrt(9 * ci), jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal(co) * 0.1, jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((B, h, w, co)), jnp.float32)
        args = (x, off, mask, wgt, bias, g)

        t_xla = measure(r, args, "0")
        fits = pallas_dcn_bwd_fits(h, w, ci, co, jnp.bfloat16, r)
        t_pal = measure(r, args, "force") if fits else float("nan")
        tag = f"{h}^2 C{ci}->{co} r{r} x{cnt}"
        ratio = t_xla / t_pal if fits else float("nan")
        print(f"{tag:28s} {t_xla*1e3:8.3f} {t_pal*1e3:10.3f} {ratio:6.2f}",
              flush=True)
        totals["xla"] += cnt * t_xla
        totals["pallas"] += cnt * (t_pal if fits else t_xla)
        totals["best"] += cnt * min(t_xla, t_pal if fits else t_xla)
    print(f"\nper-512^2-pass totals (ms/B8): xla {totals['xla']*1e3:.1f}  "
          f"pallas-where-fits {totals['pallas']*1e3:.1f}  "
          f"best-mix {totals['best']*1e3:.1f}")


if __name__ == "__main__":
    main()
