"""Training-step throughput benchmark (img/s/chip) for any arch.

Methodology: single-call scalar-fetch timing + batch differencing (the only
valid timing on the async remote runtime — see BENCHMARKS.md).

Run: python benchmarks/bench_train_step.py [--arch dla_34] [--size 512]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="dla_34")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--b1", type=int, default=4)
    ap.add_argument("--b2", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from centernet_tpu import CenterNetDetection
    from centernet_tpu.parallel.trainer import TrainState, make_train_step

    task = CenterNetDetection(args.arch, dtype=jnp.bfloat16)
    variables = task.init_variables(jax.random.PRNGKey(0),
                                    (args.size, args.size))
    tx = task.configure_optimizer(1)
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(task, tx))

    rng = np.random.default_rng(0)

    def make_batch(b):
        # raw padded annotations (on-device encoding path)
        n = 128
        boxes = np.zeros((b, n, 4), np.float32)
        boxes[:, :8] = rng.uniform(10, 200, (b, 8, 4))
        target = {
            "boxes": boxes,
            "classes": rng.integers(0, 80, (b, n)).astype(np.int32),
            "keypoints_raw": np.zeros((b, n, 17, 3), np.float32),
            "valid": (np.arange(n) < 8)[None].repeat(b, 0),
        }
        img = rng.standard_normal((b, args.size, args.size, 3)).astype(
            np.float32)
        return jnp.asarray(img), {k: jnp.asarray(v) for k, v in target.items()}

    def timed(b):
        batch = make_batch(b)
        st = state
        st, stats = step(st, batch)  # compile + warm
        np.asarray(stats["loss"])
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            st, stats = step(st, batch)
            np.asarray(stats["loss"])  # scalar fetch = sync
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = timed(args.b1)
    t2 = timed(args.b2)
    per_img = (t2 - t1) / (args.b2 - args.b1)
    print(f"{args.arch} train step {args.size}^2 bf16: "
          f"B{args.b1} {t1*1e3:.1f} ms, B{args.b2} {t2*1e3:.1f} ms, "
          f"marginal {per_img*1e3:.2f} ms/img -> {1/per_img:.1f} img/s/chip")


if __name__ == "__main__":
    main()
