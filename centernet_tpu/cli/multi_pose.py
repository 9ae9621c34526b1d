"""Multi-pose training CLI (reference: centernet_multi_pose.py cli_main,
:324-471)."""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data import (
    CenterDetectionSample,
    ComposeSample,
    ImageAugmentation,
    MultiPoseSample,
    MultiSampleTransform,
    Normalize,
    PoseFlip,
    eval_augmenter,
    pose_train_augmenter,
)
from ..data import transforms as T
from ..data.coco import CocoDetection
from ..data.loader import DataLoader
from ..parallel.mesh import make_mesh
from ..parallel.trainer import CheckpointCallback, Trainer
from ..tasks.multi_pose import CenterNetMultiPose
from ..utils.coco_eval import CocoEvaluator
from .common import add_data_args, add_model_args, add_trainer_args, parse_milestones


def build_pipelines(task, input_size: int = 512, host_normalize: bool = False):
    norm = Normalize(task.mean, task.std)
    # target encoding runs on device (task.encode_targets); host pads only.
    # Train images ship uint8 by default and normalize on device
    # (task.prep_images, see cli/detection.build_pipelines).
    from ..data import PaddedAnnotationSample

    train_transform = ComposeSample(
        [
            ImageAugmentation(
                pose_train_augmenter(input_size),
                norm if host_normalize else None,
            ),
            PoseFlip(0.5),
            PaddedAnnotationSample(),
        ]
    )
    valid_transform = ComposeSample(
        [
            ImageAugmentation(
                eval_augmenter(input_size),
                norm if host_normalize else None,
            ),
            PaddedAnnotationSample(),
        ]
    )
    return train_transform, valid_transform


def cli_main(argv=None):
    # Multi-host init must precede ANY other JAX use (weight import, jit).
    from ..parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    np.random.seed(5318008)
    T.seed(107734)

    parser = argparse.ArgumentParser("centernet_tpu multi-pose")
    add_data_args(parser)
    add_model_args(parser)
    add_trainer_args(parser)
    parser.add_argument("--test_only", action="store_true")
    args = parser.parse_args(argv)

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    task = CenterNetMultiPose(
        args.arch,
        learning_rate=args.learning_rate,
        learning_rate_milestones=parse_milestones(args.learning_rate_milestones),
        dtype=dtype,
    )

    train_transform, valid_transform = build_pipelines(task, args.input_size, host_normalize=args.host_normalize)
    coco_train = CocoDetection(
        os.path.join(args.image_root, "train2017"),
        os.path.join(args.annotation_root, "person_keypoints_train2017.json"),
        transforms=train_transform,
    )
    coco_val = CocoDetection(
        os.path.join(args.image_root, "val2017"),
        os.path.join(args.annotation_root, "person_keypoints_val2017.json"),
        transforms=valid_transform,
    )

    train_loader = DataLoader(
        coco_train,
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        shuffle=True,
        seed=5318008,
        worker_mode=args.worker_mode,
    )
    val_loader = DataLoader(
        coco_val,
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        shuffle=False,
        worker_mode=args.worker_mode,
    )

    trainer = Trainer(
        task,
        mesh=make_mesh(n_data=args.num_devices),
        max_epochs=args.max_epochs,
        limit_train_batches=args.limit_train_batches,
        limit_val_batches=args.limit_val_batches,
        log_dir=os.path.join(args.default_root_dir, "tb_logs", "multi_pose"),
        checkpoint=CheckpointCallback(
            dirpath=os.path.join(args.default_root_dir, "checkpoints"),
        ),
        steps_per_epoch_hint=max(1, len(train_loader)),
        gradient_clip_val=args.gradient_clip_val,
        accumulate_grad_batches=args.accumulate_grad_batches,
    )
    trainer.init_state(input_hw=(args.input_size, args.input_size))

    if args.pretrained_weights_path:
        from ..utils.torch_import import load_legacy_centernet_weights

        variables = load_legacy_centernet_weights(
            args.pretrained_weights_path, task, trainer.state.variables()
        )
        trainer.state = trainer.state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
    elif args.backbone_weights:
        from ..utils.torch_import import load_imagenet_backbone

        variables = load_imagenet_backbone(
            args.backbone_weights, task, trainer.state.variables()
        )
        trainer.state = trainer.state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )

    if not args.test_only:
        if args.profile:
            from ..utils.profiling import trace

            with trace(os.path.join(args.default_root_dir, "profile")):
                trainer.fit(
                    train_loader, val_loader, resume_from=args.resume_from
                )
        else:
            trainer.fit(train_loader, val_loader, resume_from=args.resume_from)

    if args.skip_test:
        return trainer

    # preshard the id list per process (decode only this host's shard)
    eval_ids = coco_val.ids[jax.process_index() :: jax.process_count()]
    test_ds = (
        (coco_val._load_image(i)[..., ::-1].astype(np.float32) / 255.0, i)
        for i in eval_ids
    )
    # Reference evaluates keypoints AND bbox from the same detections
    # (centernet_multi_pose.py:300-321) -> test/kp_* and test/bbox_*.
    stats = trainer.test(
        test_ds,
        [
            ("kp_", CocoEvaluator(coco_val.coco, "keypoints")),
            ("bbox_", CocoEvaluator(coco_val.coco, "bbox")),
        ],
        presharded=True,
    )
    print(stats)
    return trainer


if __name__ == "__main__":
    cli_main()
