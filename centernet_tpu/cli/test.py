"""Eval-only CLI (reference: centernet_test.py cli_test, :20-84).

Loads either task, optionally restores a checkpoint or imports legacy torch
weights, and runs ``trainer.test`` with ``--flip`` / ``--multi_scale`` TTA.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import make_mesh
from ..parallel.trainer import Trainer
from ..tasks.detection import CenterNetDetection
from ..tasks.multi_pose import CenterNetMultiPose
from ..utils.coco_eval import CocoEvaluator
from .common import add_model_args

TASKS = {
    "detection": CenterNetDetection,
    "multi_pose": CenterNetMultiPose,
}

MULTI_SCALES = [0.5, 0.75, 1.0, 1.25, 1.5]  # reference centernet_test.py


def cli_test(argv=None):
    # Multi-host init must precede ANY other JAX use (weight import, jit).
    from ..parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    parser = argparse.ArgumentParser("centernet_tpu test")
    parser.add_argument("task", choices=list(TASKS))
    parser.add_argument("image_root")
    parser.add_argument("annotation_root")
    add_model_args(parser)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--pretrained_weights_path", default=None)
    parser.add_argument("--flip", action="store_true")
    parser.add_argument("--multi_scale", action="store_true")
    parser.add_argument(
        "--batched", action="store_true",
        help="evaluate through the batched fixed-shape serving path "
        "(single scale, no TTA; one device round trip per "
        "--eval_batch_size images instead of per image)",
    )
    parser.add_argument("--eval_batch_size", type=int, default=16)
    parser.add_argument(
        "--spatial", type=int, default=1, metavar="M",
        help="with --batched: shard each image's H axis over M devices "
        "(the 'model' mesh axis) — GSPMD conv-halo spatial parallelism; "
        "scales single-image LATENCY, which data parallelism cannot "
        "(parallel/spatial.py; no reference analog)",
    )
    parser.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    parser.add_argument(
        "--export_serving",
        default=None,
        metavar="PATH",
        help="also write an AOT serving artifact (StableHLO, weights "
        "baked) for the restored model — see utils/export.py",
    )
    parser.add_argument(
        "--export_batch", type=int, default=8,
        help="batch size baked into --export_serving",
    )
    parser.add_argument(
        "--export_size", type=int, default=512,
        help="input size baked into --export_serving",
    )
    args = parser.parse_args(argv)

    from ..data.coco import CocoDetection

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    tta = dict(
        test_scales=MULTI_SCALES if args.multi_scale else None,
        test_flip=args.flip,
        dtype=dtype,
    )
    # Self-describing checkpoints: the .meta.json sidecar persists the task
    # hyperparameters (arch, head config, ...), so eval does not depend on
    # the user re-specifying --arch correctly (reference: Lightning
    # load_from_checkpoint via save_hyperparameters, centernet_test.py:72-74).
    meta_hp = None
    if args.checkpoint:
        from ..utils.checkpoint import load_checkpoint_hparams

        meta_hp = load_checkpoint_hparams(args.checkpoint)
    if meta_hp is not None:
        from ..tasks import task_from_hparams

        if meta_hp.get("arch") != args.arch:
            print(
                f"[cli_test] using arch {meta_hp.get('arch')!r} from "
                f"checkpoint hparams (flag/default was {args.arch!r})"
            )
        task = task_from_hparams(meta_hp, **tta)
        expected = TASKS[args.task].__name__
        if meta_hp.get("task") != expected:
            raise SystemExit(
                f"checkpoint was saved by task {meta_hp.get('task')!r} but "
                f"'{args.task}' was requested ({expected})"
            )
    else:
        task = TASKS[args.task](args.arch, **tta)

    ann_file = (
        "instances_val2017.json"
        if args.task == "detection"
        else "person_keypoints_val2017.json"
    )
    coco_val = CocoDetection(
        os.path.join(args.image_root, "val2017"),
        os.path.join(args.annotation_root, ann_file),
    )

    trainer = Trainer(task, mesh=make_mesh())
    trainer.init_state()

    if args.pretrained_weights_path:
        from ..utils.torch_import import load_legacy_centernet_weights

        variables = load_legacy_centernet_weights(
            args.pretrained_weights_path, task, trainer.state.variables()
        )
        trainer.state = trainer.state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
    elif args.checkpoint:
        from ..utils.checkpoint import restore_checkpoint

        trainer.state = restore_checkpoint(args.checkpoint, trainer.state)

    if args.export_serving:
        from ..utils.export import export_serving

        export_serving(
            task,
            trainer.state.variables(),
            args.export_serving,
            input_size=args.export_size,
            batch=args.export_batch,
        )
        print(f"[cli_test] serving artifact written to {args.export_serving}")

    prefix = ""
    if args.multi_scale:
        prefix += "multi-scale_"
    if args.flip:
        prefix += "flip_"

    # preshard the id list per process (decode only this host's shard)
    eval_ids = coco_val.ids[jax.process_index() :: jax.process_count()]
    test_ds = (
        (coco_val._load_image(i)[..., ::-1].astype(np.float32) / 255.0, i)
        for i in eval_ids
    )
    if args.task == "detection":
        evals = [(prefix, CocoEvaluator(coco_val.coco, "bbox"))]
    else:
        # pose logs both keypoint and bbox AP from the same detections
        # (reference centernet_multi_pose.py:300-321)
        evals = [
            (prefix + "kp_", CocoEvaluator(coco_val.coco, "keypoints")),
            (prefix + "bbox_", CocoEvaluator(coco_val.coco, "bbox")),
        ]
    if args.batched:
        if args.flip or args.multi_scale:
            raise SystemExit(
                "--batched is the single-scale serving path; drop "
                "--flip/--multi_scale or use the TTA loop"
            )
        infer_fn = None
        if args.spatial > 1:
            from ..parallel.spatial import make_spatial_infer

            # pure latency scaling: batch unsharded (data=1), H over M chips
            smesh = make_mesh(n_data=1, n_model=args.spatial)
            infer_fn = make_spatial_infer(task, smesh)
        stats = trainer.test_batched(
            test_ds, evals, batch_size=args.eval_batch_size,
            presharded=True, infer_fn=infer_fn,
        )
    else:
        if args.spatial > 1:
            raise SystemExit("--spatial requires --batched (fixed shapes)")
        stats = trainer.test(test_ds, evals, presharded=True)
    print(stats)
    return stats


if __name__ == "__main__":
    cli_test()
