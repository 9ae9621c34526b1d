"""Transform tests (mirror reference tests/test_transforms.py)."""

import json
import os

import numpy as np

from centernet_tpu.data import (
    Fliplr,
    Identity,
    ImageAugmentation,
    PoseFlip,
)
from centernet_tpu.data import transforms as T

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "coco_annotation.json")


def _load_anns():
    with open(FIXTURE) as f:
        return json.load(f)


def test_image_augmentation_identity():
    img = (255 * np.random.rand(64, 64, 3)).astype(np.uint8)
    anns = _load_anns()

    out_img, out_anns = ImageAugmentation(Identity())(img, anns)

    # BGR flip happens (reference transforms/image.py:18) but nothing else.
    np.testing.assert_array_equal(out_img, img[..., ::-1])
    for a, b in zip(anns, out_anns):
        np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(a["keypoints"]), np.asarray(b["keypoints"]), atol=1e-4
        )


def test_image_augmentation_fliplr_changes_annotations():
    img = (255 * np.random.rand(128, 128, 3)).astype(np.uint8)
    anns = _load_anns()
    # shrink boxes into the 128 frame
    for a in anns:
        a["bbox"] = [v / 4 for v in a["bbox"]]
        a["keypoints"] = [
            v / 4 if (i % 3) != 2 else v for i, v in enumerate(a["keypoints"])
        ]

    out_img, out_anns = ImageAugmentation(Fliplr(1.0))(img, anns)

    np.testing.assert_array_equal(out_img, img[..., ::-1][:, ::-1])
    w = img.shape[1]
    for a, b in zip(anns, out_anns):
        x, y, bw, bh = a["bbox"]
        fx, fy, fbw, fbh = b["bbox"]
        np.testing.assert_allclose([fy, fbw, fbh], [y, bw, bh], atol=1e-6)
        np.testing.assert_allclose(fx, (w - 1) - (x + bw), atol=1e-6)
        # visible keypoints mirrored
        pa = np.asarray(a["keypoints"]).reshape(17, 3)
        pb = np.asarray(b["keypoints"]).reshape(17, 3)
        vis = pa[:, 2] > 0
        np.testing.assert_allclose(pb[vis, 0], (w - 1) - pa[vis, 0], atol=1e-4)
        np.testing.assert_allclose(pb[vis, 1], pa[vis, 1], atol=1e-4)
        np.testing.assert_array_equal(pb[~vis], 0)


def test_pose_flip_involution():
    img = np.random.rand(512, 512, 3).astype(np.float32)
    anns = _load_anns()

    flip = PoseFlip(flip_probability=1.1)  # always flips
    img1, anns1 = flip(img, anns)
    img2, anns2 = flip(img1, anns1)

    np.testing.assert_array_equal(img2, img)
    for a, b in zip(anns, anns2):
        np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1e-5)
        pa = np.asarray(a["keypoints"], np.float32).reshape(17, 3)
        pb = np.asarray(b["keypoints"], np.float32).reshape(17, 3)
        vis = pa[:, 2] > 0
        # invisible joints are zeroed by the first flip; visible ones round-trip
        np.testing.assert_allclose(pb[vis], pa[vis], atol=1e-4)


def test_pose_flip_swaps_joints():
    img = np.random.rand(512, 512, 3).astype(np.float32)
    anns = _load_anns()
    _, flipped = PoseFlip(1.1)(img, anns)
    w = img.shape[1]
    for a, b in zip(anns, flipped):
        pa = np.asarray(a["keypoints"], np.float32).reshape(17, 3)
        pb = np.asarray(b["keypoints"], np.float32).reshape(17, 3)
        for j, src in enumerate(PoseFlip.flip_idx_array):
            if pa[src, 2] == 0:
                np.testing.assert_array_equal(pb[j], 0)
            else:
                np.testing.assert_allclose(pb[j, 0], w - pa[src, 0] - 1, atol=1e-4)
                np.testing.assert_allclose(pb[j, 1:], pa[src, 1:], atol=1e-4)


def test_train_augmenter_runs_and_keeps_shapes():
    T.seed(107734)
    aug = T.detection_train_augmenter()
    img = (255 * np.random.rand(480, 640, 3)).astype(np.uint8)
    anns = _load_anns()
    out_img, out_anns = ImageAugmentation(aug)(img, anns)
    assert out_img.shape == (512, 512, 3)
    assert len(out_anns) == len(anns)
    for ann in out_anns:
        assert len(ann["bbox"]) == 4
        assert len(ann["keypoints"]) == 51


def test_transforms_do_not_mutate_input_target():
    """ImageAugmentation / PoseFlip copy the annotation dicts SHALLOWLY
    (deepcopy of real COCO anns pays for segmentation polygons every
    sample) — which is only sound while every write assigns a fresh value.
    Guard the contract: the caller's dicts and their nested values must
    come back bit-identical."""
    import copy

    T.seed(3)
    img = (255 * np.random.rand(480, 640, 3)).astype(np.uint8)
    anns = _load_anns()
    for a in anns:
        a["segmentation"] = [[1.0, 2.0, 3.0, 4.0, 5.0, 6.0]]
    snapshot = copy.deepcopy(anns)

    ImageAugmentation(T.detection_train_augmenter())(img, anns)
    PoseFlip(1.1)(np.random.rand(64, 64, 3).astype(np.float32), anns)

    assert anns == snapshot
