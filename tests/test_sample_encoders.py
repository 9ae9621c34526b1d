"""Sample encoders vs a numpy transliteration of the reference's host loops
(sample/ctdet.py:39-90, sample/multi_pose.py:35-112)."""

import math

import numpy as np

from centernet_tpu.data.sample import encode_detection, encode_multi_pose
from tests.reference_numpy import (
    draw_msra_gaussian_np,
    draw_umich_gaussian_np,
    gaussian_radius_np,
)


def _scale_clip(p, out_w, out_h, down=4):
    x = np.clip(p[0] / down, 0, out_w - 1)
    y = np.clip(p[1] / down, 0, out_h - 1)
    return np.array([x, y], np.float32)


def reference_encode_detection(boxes_xywh, classes, n, input_hw, num_classes,
                               max_objects=128, down=4):
    in_h, in_w = input_hw
    out_h, out_w = in_h // down, in_w // down
    heatmap = np.zeros((num_classes, out_h, out_w), np.float32)
    wh = np.zeros((max_objects, 2), np.float32)
    reg = np.zeros((max_objects, 2), np.float32)
    reg_mask = np.zeros(max_objects, bool)
    ind = np.zeros(max_objects, np.int64)
    for k in range(min(n, max_objects)):
        x, y, w_, h_ = boxes_xywh[k]
        bbox = np.array([x, y, x + w_, y + h_], np.float32)
        bbox[:2] = _scale_clip(bbox[:2], out_w, out_h, down)
        bbox[2:] = _scale_clip(bbox[2:], out_w, out_h, down)
        h, w = bbox[3] - bbox[1], bbox[2] - bbox[0]
        if h > 0 and w > 0:
            radius = max(0, int(gaussian_radius_np((math.ceil(h), math.ceil(w)))))
            ct = np.array(
                [(bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2], np.float32
            )
            ct_int = ct.astype(np.int32)
            draw_umich_gaussian_np(heatmap[classes[k]], ct_int, radius)
            wh[k] = [w, h]
            ind[k] = ct_int[1] * out_w + ct_int[0]
            reg[k] = ct - ct_int
            reg_mask[k] = True
    return heatmap.transpose(1, 2, 0), wh, reg, reg_mask, ind


def test_encode_detection_matches_reference_loop():
    rng = np.random.RandomState(11)
    n, max_objects = 40, 128
    boxes = np.zeros((max_objects, 4), np.float32)
    boxes[:n, :2] = rng.rand(n, 2) * 480
    boxes[:n, 2:] = rng.rand(n, 2) * 150 + 2
    classes = np.zeros(max_objects, np.int32)
    classes[:n] = rng.randint(0, 80, n)
    valid = np.arange(max_objects) < n

    enc = encode_detection(boxes, classes, valid, (512, 512), 80)
    hm_ref, wh_ref, reg_ref, mask_ref, ind_ref = reference_encode_detection(
        boxes, classes, n, (512, 512), 80
    )

    np.testing.assert_allclose(
        np.asarray(enc["heatmap"]), hm_ref, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(enc["width_height"]), wh_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(enc["regression"]), reg_ref, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(enc["regression_mask"]), mask_ref)
    np.testing.assert_array_equal(np.asarray(enc["indices"]), ind_ref)


def test_encode_detection_degenerate_boxes_ignored():
    boxes = np.array([[10, 10, 0.0, 50.0], [20, 20, 40.0, 0.0]], np.float32)
    boxes = np.pad(boxes, ((0, 126), (0, 0)))
    classes = np.zeros(128, np.int32)
    valid = np.arange(128) < 2
    enc = encode_detection(boxes, classes, valid, (512, 512), 80)
    assert not np.asarray(enc["regression_mask"]).any()
    assert np.asarray(enc["heatmap"]).max() == 0.0


def reference_encode_multi_pose(boxes_xywh, kps, n, input_hw, num_joints=17,
                                max_objects=128, down=4):
    in_h, in_w = input_hw
    out_h, out_w = in_h // down, in_w // down
    hm_kp = np.zeros((num_joints, out_h, out_w), np.float32)
    kp_t = np.zeros((max_objects, num_joints * 2), np.float32)
    kp_m = np.zeros((max_objects, num_joints * 2), bool)
    hp_off = np.zeros((max_objects * num_joints, 2), np.float32)
    hp_ind = np.zeros(max_objects * num_joints, np.int64)
    hp_m = np.zeros(max_objects * num_joints, bool)
    for k in range(min(n, max_objects)):
        x, y, w_, h_ = boxes_xywh[k]
        bbox = np.array([x, y, x + w_, y + h_], np.float32)
        bbox[:2] = _scale_clip(bbox[:2], out_w, out_h, down)
        bbox[2:] = _scale_clip(bbox[2:], out_w, out_h, down)
        ct_int = np.array(
            [(bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2], np.int32
        )
        h, w = bbox[3] - bbox[1], bbox[2] - bbox[0]
        if h > 0 and w > 0:
            hp_radius = gaussian_radius_np((math.ceil(h), math.ceil(w)))
            for j in range(num_joints):
                if kps[k, j, 2] == 0:
                    continue
                pt = _scale_clip(kps[k, j, :2], out_w, out_h, down)
                kp_t[k, 2 * j : 2 * j + 2] = pt - ct_int
                kp_m[k, 2 * j : 2 * j + 2] = True
                pt_int = pt.astype(np.int32)
                hp_off[k * num_joints + j] = pt - pt_int
                hp_ind[k * num_joints + j] = pt_int[1] * out_w + pt_int[0]
                hp_m[k * num_joints + j] = True
                draw_msra_gaussian_np(hm_kp[j], pt_int, hp_radius)
    return hm_kp.transpose(1, 2, 0), kp_t, kp_m, hp_off, hp_ind, hp_m


def test_encode_multi_pose_matches_reference_loop():
    rng = np.random.RandomState(13)
    n, max_objects, J = 12, 128, 17
    boxes = np.zeros((max_objects, 4), np.float32)
    boxes[:n, :2] = rng.rand(n, 2) * 400
    boxes[:n, 2:] = rng.rand(n, 2) * 120 + 30
    kps = np.zeros((max_objects, J, 3), np.float32)
    kps[:n, :, 0] = boxes[:n, None, 0] + rng.rand(n, J) * boxes[:n, None, 2]
    kps[:n, :, 1] = boxes[:n, None, 1] + rng.rand(n, J) * boxes[:n, None, 3]
    kps[:n, :, 2] = rng.randint(0, 3, (n, J))
    valid = np.arange(max_objects) < n

    enc = encode_multi_pose(boxes, kps, valid, (512, 512))
    hm_ref, kp_ref, kpm_ref, off_ref, ind_ref, m_ref = (
        reference_encode_multi_pose(boxes, kps, n, (512, 512))
    )

    np.testing.assert_allclose(
        np.asarray(enc["heatmap_keypoints"]), hm_ref, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(enc["keypoints"]), kp_ref, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(enc["keypoints_mask"]), kpm_ref)
    np.testing.assert_allclose(
        np.asarray(enc["heatmap_keypoints_offset"]), off_ref, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(enc["heatmap_keypoints_indices"]), ind_ref
    )
    np.testing.assert_array_equal(np.asarray(enc["heatmap_keypoints_mask"]), m_ref)
