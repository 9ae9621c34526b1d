"""Benchmark: fused-decode inference throughput on the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: dla_34 detection forward + full ctdet decode (sigmoid ->
3x3 maxpool NMS -> top-100 -> gathers -> boxes) at 512x512, batched,
bfloat16 compute, images/sec on one chip. Everything stays on device; only
[B, 100, 6] detections cross to host.

Timing methodology: the remote-tunnel TPU runtime dispatches asynchronously
and ``block_until_ready`` does not wait for execution — only a host transfer
does. We therefore run the step inside an on-device ``lax.fori_loop`` whose
iterations are data-dependent (an output scalar is written back into the
input image, so XLA cannot elide or reorder them), fetch the final result,
and difference two loop lengths to cancel dispatch/transfer overhead.

Baseline: the reference repo publishes no throughput numbers (BASELINE.md).
The north-star target is 2x an A100 running the reference's torch DLA-34
inference; the best public anchor is the original CenterNet paper's 52 FPS
(DLA-34, 512x512, batch 1, Titan Xp) scaled ~4x for A100-class batched
inference => ~208 img/s. vs_baseline = value / (2 * 208).
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_A100_IMG_S = 208.0  # assumed reference torch DLA-34 batched infer
TARGET = 2.0 * BASELINE_A100_IMG_S


def main():
    from centernet_tpu import CenterNetDetection
    from centernet_tpu.ops.decode import ctdet_decode

    batch = 8
    size = 512
    k = 100
    task = CenterNetDetection("dla_34", dtype=jnp.bfloat16)
    variables = task.init_variables(jax.random.PRNGKey(0), (size, size))

    def forward_decode(variables, images):
        out = task.model.apply(variables, images, False)[-1]
        return ctdet_decode(
            jax.nn.sigmoid(out["heatmap"]),
            out["width_height"],
            out["regression"],
            k=k,
        )

    @functools.partial(jax.jit, static_argnames=("n",))
    def bench_loop(variables, images, n):
        def body(_, det):
            # Data dependency: feed one decoded scalar back into the input so
            # iterations serialize and cannot be constant-folded.
            imgs = images.at[0, 0, 0, 0].set(det[0, 0, 0] * 1e-6)
            return forward_decode(variables, imgs)

        init = jnp.zeros((batch, k, 6), jnp.float32)
        return jax.lax.fori_loop(0, n, body, init)

    images = jnp.asarray(np.random.rand(batch, size, size, 3).astype(np.float32))

    n_small, n_large = 2, 10
    # Warmup/compile both loop lengths (fetch forces execution).
    np.asarray(bench_loop(variables, images, n_small))
    np.asarray(bench_loop(variables, images, n_large))

    def timed(n):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(bench_loop(variables, images, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_small = timed(n_small)
    t_large = timed(n_large)
    per_iter = (t_large - t_small) / (n_large - n_small)
    img_per_sec = batch / per_iter

    print(
        json.dumps(
            {
                "metric": "dla34_fused_decode_infer_images_per_sec_per_chip",
                "value": round(img_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
