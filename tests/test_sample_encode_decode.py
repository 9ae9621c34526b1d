"""Encode -> decode round trip — the fidelity contract
(mirrors reference tests/test_sample_encode_decode.py:14-56)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from centernet_tpu.data import (
    CategoryIdToClass,
    CenterDetectionSample,
    ComposeSample,
    Identity,
    ImageAugmentation,
    MultiPoseSample,
    Normalize,
)
from centernet_tpu.ops.decode import ctdet_decode, multi_pose_decode

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "coco_annotation.json")


def _load_anns():
    with open(FIXTURE) as f:
        return json.load(f)


def test_cdet_encoding_decoding():
    sample_encoding = ComposeSample(
        [
            ImageAugmentation(Identity(), Normalize()),
            CategoryIdToClass(range(0, 100)),
            CenterDetectionSample(),
        ]
    )

    img = (255 * np.random.rand(512, 512, 3)).astype(np.uint8)
    coco_annotation = _load_anns()

    ann_center = np.zeros((len(coco_annotation), 2))
    for i, ann in enumerate(coco_annotation):
        x, y, w, h = ann["bbox"]
        ann_center[i, 0] = x + w / 2
        ann_center[i, 1] = y + h / 2

    img, output = sample_encoding(img, coco_annotation)

    heatmap = output["heatmap"][None]  # [1, H, W, C]
    _, height, width, _ = heatmap.shape
    wh = np.zeros((1, height, width, 2), np.float32)
    reg = np.zeros((1, height, width, 2), np.float32)

    indices = output["indices"]
    iy, ix = indices // width, indices % width
    wh[0, iy, ix] = output["width_height"]
    reg[0, iy, ix] = output["regression"]

    detections = np.asarray(ctdet_decode(jnp.asarray(heatmap), wh, reg))
    detections = detections.squeeze(0)
    detections = 4 * detections[detections[:, 4] > 0.5]

    center = (detections[:, :2] + detections[:, 2:4]) / 2.0
    assert abs(np.sum(center) - np.sum(ann_center)) == pytest.approx(0.0, abs=1e-3)


def test_multi_pose_encoding_decoding():
    """Pose analog: regressed keypoints scattered at center indices decode
    back to the annotated joint positions."""
    sample_encoding = ComposeSample(
        [
            ImageAugmentation(Identity(), Normalize()),
            CategoryIdToClass([1]),
            MultiPoseSample(),
        ]
    )

    img = (255 * np.random.rand(512, 512, 3)).astype(np.uint8)
    coco_annotation = _load_anns()
    img, pose = sample_encoding(img, coco_annotation)

    # Also need detection targets for centers.
    _, det = CenterDetectionSample(num_classes=1)(img, coco_annotation)

    height = width = 128
    heat = np.zeros((1, height, width, 1), np.float32)
    wh = np.zeros((1, height, width, 2), np.float32)
    reg = np.zeros((1, height, width, 2), np.float32)
    kps = np.zeros((1, height, width, 34), np.float32)

    indices = det["indices"]
    iy, ix = indices // width, indices % width
    n_real = int(det["regression_mask"].sum())
    heat[0, iy[:n_real], ix[:n_real], 0] = 1.0
    wh[0, iy, ix] = det["width_height"]
    reg[0, iy, ix] = det["regression"]
    kps[0, iy, ix] = pose["keypoints"]

    out = np.asarray(
        multi_pose_decode(jnp.asarray(heat), wh, kps, reg=reg, k=10)
    ).squeeze(0)
    out = out[out[:, 4] > 0.5]
    assert out.shape[0] == n_real

    # Each decoded keypoint (center-relative + center) must equal the
    # encoder's clipped/scaled joint position where the joint is visible.
    kp_mask = pose["keypoints_mask"].reshape(-1, 17, 2)[:n_real, :, 0]
    decoded = out[:, 5:39].reshape(-1, 17, 2)

    for k, ann in enumerate(coco_annotation[:n_real]):
        pts = np.array(ann["keypoints"], np.float32).reshape(17, 3)
        for j in range(17):
            if not kp_mask[k, j]:
                continue
            expect = np.clip(pts[j, :2] / 4.0, 0, 127)
            np.testing.assert_allclose(
                decoded[k, j], expect, atol=1e-3,
                err_msg=f"object {k} joint {j}",
            )
