"""Per-shape shootout: banded vs gather vs Pallas DCN forward at every
distinct dla_34 DCN layer shape (512^2 input, B8 bf16).

Round-2 measured a ~30-45 ms pallas_call dispatch tax on the axon runtime
and shelved the Pallas kernel; round-4 re-measurement (chained-call
marginal timing) shows the tax is gone and the kernel is ~2.9x faster
than banded at the dominant fine scale. This sweep decides the per-shape
eval-time dispatch (ops/dcn.py "auto").

Timing: N sequential dependent calls inside one jit (output feeds a
dummy elementwise update of the input), host scalar fetch to sync;
marginal per-call = (t(2N) - t(N)) / N. Also checks numerics vs the
banded forward with module-style pre-clamped offsets.
"""
import time
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from centernet_tpu.ops.dcn import CLIP_EPS, banded_deform_conv, dcn_v2
from centernet_tpu.ops.dcn_pallas import pallas_deform_conv_fwd

B = 8
# (H, W, Ci, Co, radius, count_in_dla34)
SHAPES = [
    (128, 128, 64, 64, 2, 5),
    (64, 64, 128, 64, 4, 4),
    (64, 64, 128, 128, 4, 2),
    (32, 32, 256, 128, 4, 2),
    (32, 32, 256, 256, 4, 1),
    (32, 32, 256, 64, 4, 1),
    (16, 16, 512, 256, 4, 1),
]


def chain(op, n):
    @jax.jit
    def f(x, off, mask, wt, bias):
        acc = jnp.zeros((), jnp.float32)
        y = x
        for _ in range(n):
            o = op(y, off, mask, wt, bias)
            acc = acc + jnp.sum(o[:, :1, :1, :1].astype(jnp.float32))
            # feed a cheap data dependency back so calls serialize
            y = x * (1 + 1e-6 * acc.astype(x.dtype))
        return acc
    return f


def measure(op, args, n=4, reps=5):
    f1, f2 = chain(op, n), chain(op, 2 * n)
    float(f1(*args)), float(f2(*args))  # compile + warm
    t1 = min(
        (lambda t0: (float(f1(*args)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(reps)
    )
    t2 = min(
        (lambda t0: (float(f2(*args)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(reps)
    )
    return (t2 - t1) / n


def main():
    print(f"devices: {jax.devices()}", flush=True)
    total = {"banded": 0.0, "gather": 0.0, "pallas": 0.0}
    for h, w, ci, co, r, cnt in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, h, w, ci)), jnp.bfloat16)
        # module-style pre-clamped offsets incl. exact boundary values
        off_np = rng.uniform(-r - 1, r + 1, (B, h, w, 18)).astype(np.float32)
        off = jnp.clip(jnp.asarray(off_np), -r, r - CLIP_EPS)
        mask = jnp.asarray(rng.uniform(0, 1, (B, h, w, 9)), jnp.float32)
        wt = jnp.asarray(
            rng.standard_normal((9 * ci, co)) * (1.0 / np.sqrt(9 * ci)),
            jnp.bfloat16,
        )
        bias = jnp.zeros((co,), jnp.bfloat16)
        args = (x, off, mask, wt, bias)

        ops = {
            "banded": lambda *a: banded_deform_conv(
                *a, radius=r, unroll_taps=True, acc32=False
            ),
            "gather": lambda *a: dcn_v2(*a, tap_mode="unroll"),
            "pallas": lambda *a: pallas_deform_conv_fwd(*a, radius=r),
        }
        # numerics: pallas vs banded (both clamp-consistent after pre-clamp)
        ob = np.asarray(ops["banded"](*args), np.float32)
        op_ = np.asarray(ops["pallas"](*args), np.float32)
        err = np.abs(op_ - ob).max() / max(np.abs(ob).max(), 1e-6)
        line = [f"{h:4d}x{w:<4d} C{ci:3d}->{co:<3d} r={r} x{cnt}  relerr={err:.2e}"]
        for name, op in ops.items():
            try:
                per = measure(op, args)
            except Exception as e:  # noqa: BLE001 - report and continue
                line.append(f"{name}=FAIL({type(e).__name__})")
                continue
            total[name] += per * cnt
            line.append(f"{name}={per*1e3:7.3f}ms")
        print("  ".join(line), flush=True)
    print(
        "TOTAL per fwd pass (ms, x counts): "
        + "  ".join(f"{k}={v*1e3:.2f}" for k, v in total.items()),
        flush=True,
    )


if __name__ == "__main__":
    main()
