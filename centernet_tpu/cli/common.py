"""Shared CLI plumbing (reference arg surface:
centernet_detection.py:268-419, centernet.py:107-119, plus the Trainer flags
the reference inherits from ``pl.Trainer.add_argparse_args``)."""

from __future__ import annotations

import argparse
from typing import List


def add_model_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--arch",
        default="dla_34",
        help="backbone architecture: res_18 | res_101 | resdcn_18 | "
        "resdcn_101 | dla_34 | hourglass",
    )
    parser.add_argument("--learning_rate", type=float, default=25e-5)
    parser.add_argument("--learning_rate_milestones", default="90,120")


def add_trainer_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--max_epochs", type=int, default=140)
    parser.add_argument("--num_devices", type=int, default=None,
                        help="devices in the data-parallel mesh (default: all)")
    parser.add_argument("--limit_train_batches", type=int, default=None)
    parser.add_argument("--limit_val_batches", type=int, default=None)
    parser.add_argument("--default_root_dir", default="./runs")
    parser.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--profile", action="store_true",
                        help="dump a jax.profiler trace of a few train steps")
    parser.add_argument("--skip_test", action="store_true",
                        help="skip the post-fit TTA test + COCO eval pass "
                        "(train-only run; evaluate later via centernet-test)")
    # Lightning-parity knobs (the reference exposes every pl.Trainer flag
    # via add_argparse_args, centernet_detection.py:282)
    parser.add_argument("--gradient_clip_val", type=float, default=None,
                        help="clip the global gradient norm before the "
                        "optimizer (Lightning gradient_clip_val)")
    parser.add_argument("--accumulate_grad_batches", type=int, default=1,
                        help="micro-batch the (effective) --batch_size "
                        "through memory as K sequential micro-batches per "
                        "optimizer update. NOTE: unlike Lightning, K does "
                        "not multiply the effective batch — to match a "
                        "Lightning config (batch B, accumulate K) use "
                        "--batch_size K*B with this flag = K. batch_size "
                        "must divide by K*num_devices")


def add_data_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("image_root")
    parser.add_argument("annotation_root")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument(
        "--host_normalize", action="store_true",
        help="normalize train images to f32 on the host (default: ship "
        "uint8, normalize on device — 4x less host->device traffic)")
    parser.add_argument(
        "--worker_mode", default="shm",
        choices=["thread", "process", "shm"],
        help="loader workers (default shm — the measured-fastest transport, "
        "BENCHMARKS.md; auto-falls back to process/thread where /dev/shm "
        "or fork is unavailable): threads (GIL-serial write-backs cap one "
        "host at ~170 samples/s), forked worker processes (the reference's "
        "num_workers=8 process workers), or processes + shared-memory "
        "batch transport (workers write rows straight into /dev/shm batch "
        "buffers; zero parent-side per-sample work)",
    )
    parser.add_argument(
        "--pretrained_weights_path",
        default=None,
        help="legacy full-CenterNet torch checkpoint to import",
    )
    parser.add_argument(
        "--backbone_weights",
        default=None,
        help="local ImageNet classifier state_dict (torchvision resnet / "
        "dl.yf.io dla34 naming) for fresh-training backbone init — the "
        "file-based equivalent of the reference's pretrained download",
    )
    parser.add_argument(
        "--resume_from",
        default=None,
        help="orbax checkpoint dir saved by this trainer; resumes epoch/"
        "step/optimizer (Lightning ckpt_path resume)",
    )
    parser.add_argument(
        "--input_size", type=int, default=512,
        help="square training resolution (reference trains at 512)",
    )


def parse_milestones(spec: str) -> List[int]:
    return [int(x) for x in str(spec).replace(" ", "").split(",") if x]
