"""Benchmark: fused-decode inference throughput on the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: dla_34 detection forward + full ctdet decode (sigmoid ->
3x3 maxpool NMS -> top-100 -> gathers -> boxes) at 512x512, batched,
bfloat16 compute, images/sec on one chip. Everything stays on device; only
[B, 100, 6] detections cross to host.

Timing methodology: the remote-tunnel TPU runtime dispatches asynchronously —
``block_until_ready`` does not wait for device execution; only a host
transfer does. Per-fetch round-trip latency is ~0.05-0.5 s, so we time
fetch-synchronized calls at two batch sizes and difference them: the
constant dispatch/transfer overhead cancels and
(t(B2) - t(B1)) / (B2 - B1) is the marginal per-image device time.
(An on-device fori_loop would be cleaner but XLA compile of looped
gather-heavy graphs is pathologically slow on this toolchain.)

Baseline: the reference repo publishes no throughput numbers (BASELINE.md).
The north-star target is 2x an A100 running the reference's torch DLA-34
inference; the best public anchor is the original CenterNet paper's 52 FPS
(DLA-34, 512x512, batch 1, Titan Xp) scaled ~4x for A100-class batched
inference => ~208 img/s. vs_baseline = value / (2 * 208).
"""

import json
import os
import subprocess
import sys
import time


def _preflight_device_probe(timeout_s: int = 180) -> None:
    """Fail fast (non-zero, no fake JSON) when the remote TPU tunnel is
    down: `import jax` itself blocks forever connecting the axon pool, so
    probe device liveness in a bounded SUBPROCESS before importing jax in
    this process. Skipped off-axon (CPU/TPU-local runs don't hang)."""
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        print(
            f"bench.py: TPU tunnel unreachable (device probe failed within "
            f"{timeout_s}s) — refusing to hang; no metric emitted",
            file=sys.stderr,
        )
        raise SystemExit(2)


_preflight_device_probe()

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: dla_34 graphs take minutes to build remotely.
# Keyed on host CPU flags — XLA:CPU AOT artifacts from a different machine
# SIGILL on load (TPU executables are unaffected but share the dir).


def _host_cache_suffix():
    try:
        import hashlib

        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "generic"


jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        f"/tmp/centernet_tpu_jax_cache_{_host_cache_suffix()}",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

# Blessed by convention in BASELINE.md ("The blessed throughput baseline
# constant") — change BOTH together if a real A100 measurement ever lands.
BASELINE_A100_IMG_S = 208.0
TARGET = 2.0 * BASELINE_A100_IMG_S

B_SMALL, B_LARGE = 4, 16
SIZE = 512
K = 100


def bench_train(task, variables) -> float:
    """dla_34 train-step img/s/chip (fwd+bwd+Adam, on-device target encode),
    same batch-differencing methodology as inference. Machine-recorded here
    so BENCH_r*.json catches train regressions round over round."""
    import optax  # noqa: F401  (optax pulled in by configure_optimizer)

    from centernet_tpu.parallel.trainer import TrainState, make_train_step

    tx = task.configure_optimizer(1)
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(task, tx), donate_argnums=(0,))
    rng = np.random.default_rng(0)

    def make_batch(b):
        n = 128
        boxes = np.zeros((b, n, 4), np.float32)
        boxes[:, :8] = rng.uniform(10, 200, (b, 8, 4))
        target = {
            "boxes": boxes,
            "classes": rng.integers(0, 80, (b, n)).astype(np.int32),
            "keypoints_raw": np.zeros((b, n, 17, 3), np.float32),
            "valid": (np.arange(n) < 8)[None].repeat(b, 0),
        }
        img = rng.standard_normal((b, SIZE, SIZE, 3)).astype(np.float32)
        return jnp.asarray(img), {k: jnp.asarray(v) for k, v in target.items()}

    def timed(b, reps=4):
        batch = make_batch(b)
        st = jax.tree_util.tree_map(jnp.copy, state)
        st, stats = step(st, batch)  # compile + warm
        np.asarray(stats["loss"])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            st, stats = step(st, batch)
            np.asarray(stats["loss"])  # scalar fetch = sync
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = timed(4)
    t2 = timed(8)
    if t2 > t1 * 1.05:
        return (8 - 4) / (t2 - t1)
    # Batch differencing degenerates when the step is overhead-dominated
    # (e.g. the conv ablation, where t(8)~t(4) and noise can make the
    # delta negative, seen as train_value=-540 in the r4 queue). Report
    # the honest lower bound instead of a sign-flipped artifact.
    return 8 / t2


def bench_host_pipeline() -> float:
    """Production host pipeline (uint8, on-device-normalize default)
    samples/s on ONE core — machine-records the loader-side throughput
    so BENCH_r*.json catches input-pipeline regressions too."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from centernet_tpu.data import (
        CategoryIdToClass,
        ComposeSample,
        ImageAugmentation,
        PaddedAnnotationSample,
        detection_train_augmenter,
    )
    from centernet_tpu.data import transforms as T
    from centernet_tpu.tasks.detection import CenterNetDetection
    from tests.utilities import CocoFakeDataset

    T.seed(0)
    pipe = ComposeSample([
        ImageAugmentation(detection_train_augmenter(512), None),
        CategoryIdToClass(CenterNetDetection.valid_ids),
        PaddedAnnotationSample(max_objects=CenterNetDetection.max_objs),
    ])
    img, target = CocoFakeDataset(transforms=None, length=1, size=512)[0]
    pipe(img, target)  # warm (noise pool build)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        pipe(img, target)
    return n / (time.perf_counter() - t0)


def main():
    from centernet_tpu import CenterNetDetection
    from centernet_tpu.ops.decode import ctdet_decode

    task = CenterNetDetection("dla_34", dtype=jnp.bfloat16)
    variables = task.init_variables(jax.random.PRNGKey(0), (SIZE, SIZE))

    @jax.jit
    def forward_decode(variables, images):
        out = task.model.apply(variables, images, False)[-1]
        return ctdet_decode(
            jax.nn.sigmoid(out["heatmap"]),
            out["width_height"],
            out["regression"],
            k=K,
        )

    imgs_small = jnp.asarray(
        np.random.rand(B_SMALL, SIZE, SIZE, 3).astype(np.float32)
    )
    imgs_large = jnp.asarray(
        np.random.rand(B_LARGE, SIZE, SIZE, 3).astype(np.float32)
    )

    def one(images):
        t0 = time.perf_counter()
        _ = np.asarray(forward_decode(variables, images)[0, 0, 0])
        return time.perf_counter() - t0

    # warm up compile + execution; the scalar fetch forces completion
    one(imgs_small)
    one(imgs_large)
    # INTERLEAVED reps: host-side contention drifts over seconds, and a
    # one-sided slowdown of only the small-batch (or only the large-batch)
    # measurements biases the differenced rate in either direction
    # (observed: 62-254 img/s scatter when CPU jobs ran concurrently).
    # Alternating small/large keeps any drift common-mode; min-of-reps then
    # cancels in the difference.
    t_smalls, t_larges = [], []
    for _ in range(8):
        t_smalls.append(one(imgs_small))
        t_larges.append(one(imgs_large))
    t_small = min(t_smalls)
    t_large = min(t_larges)
    per_img = (t_large - t_small) / (B_LARGE - B_SMALL)
    img_per_sec = 1.0 / per_img

    # training throughput rides the same JSON line as extra fields so the
    # driver-recorded BENCH_r*.json machine-checks train regressions too.
    # Sub-bench failures are NOT silent (VERDICT r3 weak #7): the record
    # carries an explicit "error" field and the process exits non-zero so
    # the driver flags the regression instead of archiving nulls.
    errors = []
    try:
        train_img_s = round(bench_train(task, variables), 2)
    except Exception as e:  # keep the headline metric, but fail loud
        print(f"train bench failed: {e!r}", file=sys.stderr)
        train_img_s = None
        errors.append(f"train: {e!r}")

    try:
        host_samples_s = round(bench_host_pipeline(), 1)
    except Exception as e:
        print(f"host pipeline bench failed: {e!r}", file=sys.stderr)
        host_samples_s = None
        errors.append(f"host_pipeline: {e!r}")

    # Self-describing record (VERDICT r4 item 8): the active config and
    # the per-layer DCN impls the "auto" selector ACTUALLY dispatched at
    # trace time, so a default flip is visible in the artifact itself and
    # BENCH_r*.json rounds stay comparable.
    from centernet_tpu.ops.dcn import DISPATCH_LOG

    def _dispatch(train_flag):
        return sorted(
            f"{h}x{w} C{ci}->{co} {impl} r={r}"
            for h, w, ci, co, impl, r, tr in DISPATCH_LOG
            if tr == train_flag
        )

    config = {
        "stem": os.environ.get("CENTERNET_TPU_DLA_STEM", "blocked"),
        "dcn_impl_env": os.environ.get("CENTERNET_TPU_DCN_IMPL", "auto"),
        "dcn_bwd": os.environ.get("CENTERNET_TPU_DCN_BWD", "vjp"),
        "dcn_bwd_pallas": os.environ.get(
            "CENTERNET_TPU_DCN_BWD_PALLAS", "1"
        ),
        "dcn_acc": os.environ.get("CENTERNET_TPU_DCN_ACC", "bf16"),
        "dcn_radius": os.environ.get("CENTERNET_TPU_DCN_RADIUS", "4"),
        "dcn_radius_fine": os.environ.get(
            "CENTERNET_TPU_DCN_RADIUS_FINE", "2"
        ),
        "tta_bucket": os.environ.get("CENTERNET_TPU_TTA_BUCKET", "128"),
        "dcn_dispatch_infer": _dispatch(False),
        "dcn_dispatch_train": _dispatch(True),
    }

    record = {
        "metric": "dla34_fused_decode_infer_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / TARGET, 3),
        "train_metric": "dla34_train_step_images_per_sec_per_chip",
        "train_value": train_img_s,
        "host_pipeline_samples_per_sec_per_core": host_samples_s,
        "config": config,
    }
    if errors:
        record["error"] = "; ".join(errors)
    print(json.dumps(record))
    if errors:
        raise SystemExit(3)


if __name__ == "__main__":
    main()
