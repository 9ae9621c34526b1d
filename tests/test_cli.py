"""End-to-end CLI smoke: a generated mini COCO dataset through
``cli/detection.py`` (train 1 epoch, 1 batch) and ``cli/test.py``-equivalent
eval — exercises CocoDetection, loaders, trainer, checkpointing, COCO eval."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _make_mini_coco(root):
    img_dir = os.path.join(root, "images", "train2017")
    val_dir = os.path.join(root, "images", "val2017")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir)
    os.makedirs(val_dir)
    os.makedirs(ann_dir)

    images, annotations = [], []
    aid = 1
    rng = np.random.RandomState(0)
    for i in range(8):
        name = f"{i:012d}.jpg"
        img = (rng.rand(128, 160, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, name), img)
        cv2.imwrite(os.path.join(val_dir, name), img)
        images.append({"id": i, "file_name": name, "width": 160, "height": 128})
        for _ in range(2):
            x, y = rng.randint(5, 80), rng.randint(5, 60)
            w, h = rng.randint(15, 60), rng.randint(15, 50)
            kps = []
            n_vis = 0
            for j in range(17):
                vis = int(rng.randint(0, 3))
                if vis == 0:
                    kps += [0.0, 0.0, 0]
                else:
                    n_vis += 1
                    kps += [
                        float(x + rng.rand() * w),
                        float(y + rng.rand() * h),
                        vis,
                    ]
            annotations.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": 1,
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "area": float(w * h),
                    "iscrowd": 0,
                    "keypoints": kps,
                    "num_keypoints": n_vis,
                }
            )
            aid += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {
                "id": 1,
                "name": "person",
                "keypoints": [f"k{j}" for j in range(17)],
            }
        ],
    }
    for name in (
        "instances_train2017.json",
        "instances_val2017.json",
        "person_keypoints_train2017.json",
        "person_keypoints_val2017.json",
    ):
        with open(os.path.join(ann_dir, name), "w") as f:
            json.dump(coco, f)
    return os.path.join(root, "images"), ann_dir


def test_detection_cli_end_to_end(tmp_path):
    from centernet_tpu.cli.detection import cli_main

    image_root, ann_root = _make_mini_coco(str(tmp_path))
    trainer = cli_main(
        [
            image_root,
            ann_root,
            "--arch",
            "res_18",
            "--batch_size",
            "8",
            "--num_workers",
            "2",
            "--max_epochs",
            "1",
            "--limit_train_batches",
            "1",
            "--limit_val_batches",
            "1",
            "--num_devices",
            "8",
            "--input_size",
            "128",
            "--precision",
            "f32",
            "--default_root_dir",
            str(tmp_path / "runs"),
        ]
    )
    assert int(trainer.state.step) == 1
    # checkpoints written (save_last)
    assert os.path.isdir(tmp_path / "runs" / "checkpoints" / "last")
    # metrics logged
    assert os.path.exists(
        tmp_path / "runs" / "tb_logs" / "detection" / "metrics.jsonl"
    )


def test_eval_cli_end_to_end(tmp_path):
    """cli/test.py: restore a CLI-written checkpoint WITHOUT --arch (the
    .meta.json hparams reconstruct the task), run flip-TTA eval over the
    mini val set, and write + reload an AOT serving artifact."""
    from centernet_tpu.cli.detection import cli_main
    from centernet_tpu.cli.test import cli_test

    image_root, ann_root = _make_mini_coco(str(tmp_path))
    cli_main(
        [
            image_root, ann_root,
            "--arch", "res_18",
            "--batch_size", "8",
            "--num_workers", "2",
            "--max_epochs", "1",
            "--limit_train_batches", "1",
            "--limit_val_batches", "1",
            "--num_devices", "8",
            "--input_size", "128",
            "--precision", "f32",
            "--skip_test",
            "--default_root_dir", str(tmp_path / "runs"),
        ]
    )
    ckpt = str(tmp_path / "runs" / "checkpoints" / "last")
    export_path = str(tmp_path / "serving.hlo")

    stats = cli_test(
        [
            "detection", image_root, ann_root,
            "--checkpoint", ckpt,
            "--flip",
            "--precision", "f32",
            "--export_serving", export_path,
            "--export_size", "64",
            "--export_batch", "1",
        ]
    )
    assert "test/flip_ap" in stats, sorted(stats)

    # the batched fixed-shape serving path is the other eval surface
    batched_stats = cli_test(
        [
            "detection", image_root, ann_root,
            "--checkpoint", ckpt,
            "--precision", "f32",
            "--batched",
            "--eval_batch_size", "4",
        ]
    )
    assert "test/ap" in batched_stats, sorted(batched_stats)

    # spatially-sharded serving (--spatial: image H over the model mesh
    # axis) must reproduce the batched stats — exactness is gated by
    # test_spatial_sharding.py; this covers the CLI plumbing
    spatial_stats = cli_test(
        [
            "detection", image_root, ann_root,
            "--checkpoint", ckpt,
            "--precision", "f32",
            "--batched",
            "--spatial", "2",
            "--eval_batch_size", "4",
        ]
    )
    assert sorted(spatial_stats) == sorted(batched_stats)
    for k, v in batched_stats.items():
        assert spatial_stats[k] == pytest.approx(v, abs=1e-3), k

    from centernet_tpu.utils.export import load_serving

    served = load_serving(export_path)
    out = served(np.zeros((1, 64, 64, 3), np.float32))
    assert np.asarray(out).shape[0] == 1


def test_multi_pose_cli_end_to_end(tmp_path):
    from centernet_tpu.cli.multi_pose import cli_main

    image_root, ann_root = _make_mini_coco(str(tmp_path))
    trainer = cli_main(
        [
            image_root,
            ann_root,
            "--arch",
            "res_18",
            "--batch_size",
            "8",
            "--num_workers",
            "2",
            "--max_epochs",
            "1",
            "--limit_train_batches",
            "1",
            "--limit_val_batches",
            "1",
            "--num_devices",
            "8",
            "--input_size",
            "128",
            "--precision",
            "f32",
            "--default_root_dir",
            str(tmp_path / "runs"),
        ]
    )
    assert int(trainer.state.step) == 1
    assert os.path.isdir(tmp_path / "runs" / "checkpoints" / "last")

    # the pose CLI must evaluate keypoints AND bbox from one prediction
    # pass (reference centernet_multi_pose.py:300-321)
    import json

    metrics_path = (
        tmp_path / "runs" / "tb_logs" / "multi_pose" / "metrics.jsonl"
    )
    logged = set()
    with open(metrics_path) as f:
        for line in f:
            logged.update(json.loads(line).keys())
    assert "test/kp_ap" in logged, sorted(logged)
    assert "test/bbox_ap" in logged, sorted(logged)
