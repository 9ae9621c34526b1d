"""Input-pipeline throughput benchmark (VERDICT round-1 item 5).

Measures host samples/sec through the FULL detection train transform
(affine-warp augmentation -> class mapping -> center-detection target
encoding) at the training resolution, single-sample and through the
threaded DataLoader, plus a per-stage breakdown.

Run: python benchmarks/bench_input_pipeline.py [--size 512] [--n 200]
Numbers land in BENCHMARKS.md; the train-step img/s they must cover come
from the training benchmarks there.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--workers", type=int, default=max(1, os.cpu_count()))
    ap.add_argument("--skip-host-encode", action="store_true",
                    help="skip the legacy host-side CenterDetectionSample "
                    "stage (jit compile at 512^2 dominates on small boxes)")
    args = ap.parse_args()

    from centernet_tpu.data import (
        CategoryIdToClass,
        CenterDetectionSample,
        ComposeSample,
        ImageAugmentation,
        Normalize,
        detection_train_augmenter,
    )
    from centernet_tpu.data.loader import DataLoader
    from centernet_tpu.tasks.detection import CenterNetDetection
    from tests.utilities import CocoFakeDataset

    aug = detection_train_augmenter(args.size)
    norm = Normalize(CenterNetDetection.mean, CenterNetDetection.std)
    stage_aug = ImageAugmentation(aug, norm)
    stage_cls = CategoryIdToClass(CenterNetDetection.valid_ids)
    stage_enc = CenterDetectionSample()
    pipeline = ComposeSample([stage_aug, stage_cls, stage_enc])

    ds_raw = CocoFakeDataset(transforms=None, length=args.n, size=args.size)

    # per-stage breakdown (single thread); warm the jit caches first
    img, target = ds_raw[0]
    t0 = time.perf_counter()
    for i in range(args.n):
        a_img, a_t = stage_aug(img, target)
    t_aug = (time.perf_counter() - t0) / args.n
    a_img, a_t = stage_cls(a_img, a_t)
    if not args.skip_host_encode:
        pipeline(img, target)
        stage_enc(a_img, a_t)  # warm
        t0 = time.perf_counter()
        for i in range(args.n):
            stage_enc(a_img, a_t)
        t_enc = (time.perf_counter() - t0) / args.n

        t0 = time.perf_counter()
        for i in range(args.n):
            pipeline(img, target)
        t_full = (time.perf_counter() - t0) / args.n

        print(f"single-thread: aug {t_aug*1e3:.2f} ms, encode {t_enc*1e3:.2f} ms,"
              f" full {t_full*1e3:.2f} ms -> {1.0/t_full:.1f} samples/s/core")
    else:
        print(f"single-thread: aug {t_aug*1e3:.2f} ms")

    # production path: host does aug + padding only (on-device encoding)
    from centernet_tpu.data import PaddedAnnotationSample

    prod = ComposeSample([stage_aug, stage_cls, PaddedAnnotationSample()])
    t0 = time.perf_counter()
    for i in range(args.n):
        prod(img, target)
    t_prod = (time.perf_counter() - t0) / args.n
    print(f"on-device-encoding host side: {t_prod*1e3:.2f} ms "
          f"-> {1.0/t_prod:.1f} samples/s/core")

    # GIL-bound serial fraction: the cv2 geometric/photometric ops release
    # the GIL, but the annotation write-back loops + padding are pure
    # Python/numpy under the GIL — they serialize across thread workers and
    # cap the whole HOST at 1/t_gil samples/s no matter how many cores.
    bgr = np.ascontiguousarray(
        np.asarray(img, np.float32)[..., ::-1]
    )
    empty_boxes = np.zeros((0, 4), np.float32)
    empty_kps = np.zeros((0, 17, 2), np.float32)
    aug(bgr, empty_boxes, empty_kps)  # warm
    t0 = time.perf_counter()
    for i in range(args.n):
        aug(bgr, empty_boxes, empty_kps)
    t_cv2 = (time.perf_counter() - t0) / args.n
    t_gil = max(t_prod - t_cv2, 1e-9)
    print(
        f"GIL breakdown: cv2-parallelizable {t_cv2*1e3:.2f} ms, "
        f"GIL-serial remainder {t_gil*1e3:.2f} ms -> host-wide cap "
        f"~{1.0/t_gil:.0f} samples/s with unlimited cores"
    )

    # loader end to end (production pipeline), both worker modes
    ds = CocoFakeDataset(transforms=prod, length=args.n, size=args.size)
    for mode in ("thread", "process", "shm"):
        # shm needs fixed global batches (no partial tail)
        drop_last = mode == "shm"
        loader = DataLoader(ds, batch_size=8, num_workers=args.workers,
                            shuffle=False, drop_last=drop_last,
                            worker_mode=mode)
        n_img = 0
        t0 = time.perf_counter()
        for imgs, tgt in loader:
            n_img += imgs.shape[0]
        dt = time.perf_counter() - t0
        print(f"DataLoader({args.workers} {mode} workers, "
              f"{os.cpu_count()} cpus): {n_img/dt:.1f} samples/s")


if __name__ == "__main__":
    main()
