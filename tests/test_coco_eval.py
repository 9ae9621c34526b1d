"""COCO evaluator sanity tests: perfect predictions give AP 1.0, misses give
0, half-matches land in between; OKS keypoint eval behaves likewise."""

import numpy as np

from centernet_tpu.utils.coco_eval import CocoEvaluator


def _gt(num_images=2):
    images = [{"id": i, "width": 512, "height": 512} for i in range(num_images)]
    annotations = []
    aid = 1
    for i in range(num_images):
        for k, box in enumerate([[50, 60, 100, 120], [200, 220, 40, 180]]):
            kps = []
            for j in range(17):
                kps += [box[0] + 2 * j, box[1] + 3 * j, 2]
            annotations.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": 1,
                    "bbox": list(map(float, box)),
                    "area": float(box[2] * box[3]),
                    "iscrowd": 0,
                    "keypoints": kps,
                    "num_keypoints": 17,
                }
            )
            aid += 1
    categories = [
        {
            "id": 1,
            "name": "person",
            "keypoints": ["k%d" % j for j in range(17)],
        }
    ]
    return {"images": images, "annotations": annotations, "categories": categories}


def test_bbox_perfect_predictions():
    gt = _gt()
    ev = CocoEvaluator(gt, "bbox")
    results = []
    for ann in gt["annotations"]:
        results.append(
            {
                "image_id": ann["image_id"],
                "category_id": 1,
                "bbox": list(ann["bbox"]),
                "score": 0.9,
            }
        )
    stats = ev(results)
    assert stats["ap"] == 1.0
    assert stats["ap_50"] == 1.0
    assert stats["ap_75"] == 1.0
    assert stats["ap_M"] == 1.0  # 40x180 = 7200 (medium)
    assert stats["ap_L"] == 1.0  # 100x120 = 12000 (large)


def test_bbox_no_predictions():
    gt = _gt()
    ev = CocoEvaluator(gt, "bbox")
    stats = ev([])
    assert stats["ap"] == 0.0


def test_bbox_shifted_predictions_partial():
    gt = _gt()
    ev = CocoEvaluator(gt, "bbox")
    results = []
    for ann in gt["annotations"]:
        x, y, w, h = ann["bbox"]
        # ~0.68 IoU: matches at low thresholds only
        results.append(
            {
                "image_id": ann["image_id"],
                "category_id": 1,
                "bbox": [x + 0.15 * w, y, w, h],
                "score": 0.9,
            }
        )
    stats = ev(results)
    assert 0.0 < stats["ap"] < 1.0
    assert stats["ap_50"] == 1.0


def test_keypoints_perfect():
    gt = _gt()
    ev = CocoEvaluator(gt, "keypoints")
    results = []
    for ann in gt["annotations"]:
        kps = np.asarray(ann["keypoints"], np.float64).reshape(-1, 3)
        kps[:, 2] = 1.0
        results.append(
            {
                "image_id": ann["image_id"],
                "category_id": 1,
                "bbox": list(ann["bbox"]),
                "score": 0.9,
                "keypoints": kps.reshape(-1).tolist(),
            }
        )
    stats = ev(results)
    assert stats["ap"] == 1.0


def test_keypoints_garbage_is_zero():
    gt = _gt()
    ev = CocoEvaluator(gt, "keypoints")
    results = [
        {
            "image_id": 0,
            "category_id": 1,
            "bbox": [0, 0, 10, 10],
            "score": 0.9,
            "keypoints": [5000.0, 5000.0, 1.0] * 17,
        }
    ]
    stats = ev(results)
    assert stats["ap"] == 0.0
