"""COCO multi-person pose task (reference: CenterNet/centernet_multi_pose.py).

Heads {heatmap:1, width_height:2, regression:2, heatmap_keypoints:17,
keypoints:34, heatmap_keypoints_offset:2} (centernet_multi_pose.py:53-60);
6-term loss with weights 1/0.1/1/1/1/1 (centernet_multi_pose.py:97-155);
pose-aware flip TTA with joint swapping and x-negation of regressed keypoint
offsets (centernet_multi_pose.py:192-211); decode via ``multi_pose_decode``;
multi-scale merge via ``soft_nms_39``; top-20 per image.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.decode import multi_pose_decode
from ..ops.losses import (
    focal_loss,
    reg_l1_loss,
    reg_weighted_l1_loss,
    sigmoid_clamped,
)
from ..ops.nms import soft_nms_39
from .base import CenterNet
from .detection import pad_to_tta_size, tta_pad_dims

# Left/right joint swap for horizontal flip (reference
# centernet_multi_pose.py:32-34).
FLIP_IDX = [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15]


class CenterNetMultiPose(CenterNet):
    """Pose task (reference CenterNetMultiPose, centernet_multi_pose.py:29)."""

    max_objs = 128
    flip_idx = FLIP_IDX

    def __init__(
        self,
        arch: str = "dla_34",
        learning_rate: float = 25e-5,
        learning_rate_milestones: Optional[Sequence[int]] = None,
        hm_weight: float = 1.0,
        wh_weight: float = 0.1,
        off_weight: float = 1.0,
        hp_weight: float = 1.0,
        hm_hp_weight: float = 1.0,
        test_scales: Optional[Sequence[float]] = None,
        test_flip: bool = True,
        test_max_per_image: int = 20,
        decode_k: int = 100,
        num_joints: int = 17,
        dtype: Any = jnp.float32,
    ):
        self.num_joints = num_joints
        self.heads = {
            "heatmap": 1,
            "width_height": 2,
            "regression": 2,
            "heatmap_keypoints": num_joints,
            "keypoints": num_joints * 2,
            "heatmap_keypoints_offset": 2,
        }
        super().__init__(arch, learning_rate, learning_rate_milestones, dtype)
        self.hm_weight = hm_weight
        self.wh_weight = wh_weight
        self.off_weight = off_weight
        self.hp_weight = hp_weight
        self.hm_hp_weight = hm_hp_weight
        self.test_scales = [1.0] if test_scales is None else list(test_scales)
        self.test_flip = test_flip
        self.test_max_per_image = test_max_per_image
        self.decode_k = decode_k

    def hparams(self):
        hp = super().hparams()
        hp.update(
            hm_weight=self.hm_weight,
            wh_weight=self.wh_weight,
            off_weight=self.off_weight,
            hp_weight=self.hp_weight,
            hm_hp_weight=self.hm_hp_weight,
            num_joints=self.num_joints,
            decode_k=self.decode_k,
        )
        return hp

    def encode_targets(self, input_hw, target):
        """Batched on-device pose target encoding: union of the 1-class
        detection targets and the keypoint targets (the reference fans out to
        both encoders via MultiSampleTransform, centernet_multi_pose.py:374)."""
        import functools

        from ..data.sample import encode_detection, encode_multi_pose

        det_fn = functools.partial(
            encode_detection,
            input_hw=tuple(input_hw),
            num_classes=1,
            down_ratio=self.down_ratio,
            gaussian_type="umich",
        )
        pose_fn = functools.partial(
            encode_multi_pose,
            input_hw=tuple(input_hw),
            num_joints=self.num_joints,
            down_ratio=self.down_ratio,
            gaussian_type="msra",
        )
        det = jax.vmap(det_fn)(
            target["boxes"], target["classes"], target["valid"]
        )
        pose = jax.vmap(pose_fn)(
            target["boxes"], target["keypoints_raw"], target["valid"]
        )
        return {**det, **pose}

    # -- loss ------------------------------------------------------------------

    def loss(self, outputs, target):
        """Six-term pose loss averaged over stacks
        (reference centernet_multi_pose.py:97-155)."""
        hm_loss = wh_loss = off_loss = 0.0
        kp_loss = hm_kp_loss = hm_offset_loss = 0.0
        num_stacks = len(outputs)
        for output in outputs:
            hm = sigmoid_clamped(output["heatmap"])
            hm_kp = sigmoid_clamped(output["heatmap_keypoints"])

            hm_loss += focal_loss(hm, target["heatmap"])
            wh_loss += reg_l1_loss(
                output["width_height"],
                target["regression_mask"],
                target["indices"],
                target["width_height"],
            )
            off_loss += reg_l1_loss(
                output["regression"],
                target["regression_mask"],
                target["indices"],
                target["regression"],
            )
            kp_loss += reg_weighted_l1_loss(
                output["keypoints"],
                target["keypoints_mask"],
                target["indices"],
                target["keypoints"],
            )
            hm_kp_loss += focal_loss(hm_kp, target["heatmap_keypoints"])
            hm_offset_loss += reg_l1_loss(
                output["heatmap_keypoints_offset"],
                target["heatmap_keypoints_mask"],
                target["heatmap_keypoints_indices"],
                target["heatmap_keypoints_offset"],
            )
        loss = (
            self.hm_weight * hm_loss
            + self.wh_weight * wh_loss
            + self.off_weight * off_loss
            + self.hp_weight * kp_loss
            + self.hm_hp_weight * hm_kp_loss
            + self.off_weight * hm_offset_loss
        ) / num_stacks
        return loss, {
            "loss": loss,
            "hm_loss": hm_loss,
            "kp_loss": kp_loss,
            "hm_kp_loss": hm_kp_loss,
            "hm_offset_loss": hm_offset_loss,
            "wh_loss": wh_loss,
            "off_loss": off_loss,
        }

    # -- inference ---------------------------------------------------------------

    def _infer_decode(self, variables, images, flip: bool, valid_hw=None):
        """Forward + pose-aware flip merge + decode (device, jitted).
        ``valid_hw`` [B, 2] int32 bounds person top-K AND keypoint-snap
        peaks to the reference-padded region (see
        CenterNet._mask_valid_region)."""
        out = self.apply(variables, images, train=False)[-1]
        hm = out["heatmap"]
        wh = out["width_height"]
        reg = out["regression"]
        kps = out["keypoints"]
        hm_kp = out["heatmap_keypoints"]
        hp_off = out["heatmap_keypoints_offset"]

        if flip:
            flip_idx = jnp.asarray(self.flip_idx, jnp.int32)
            hm = (hm[0:1] + hm[1:2, :, ::-1]) / 2.0
            wh = (wh[0:1] + wh[1:2, :, ::-1]) / 2.0
            reg = reg[0:1]

            # Pose-aware keypoint flip: mirror x offsets, swap joints
            # (reference centernet_multi_pose.py:202-206).
            b, h, w, c = kps.shape
            fk = kps[1:2, :, ::-1].reshape(1, h, w, c // 2, 2)
            fk = fk.at[..., 0].multiply(-1.0)
            fk = fk[:, :, :, flip_idx, :].reshape(1, h, w, c)
            kps = (kps[0:1] + fk) / 2.0

            fh = hm_kp[1:2, :, ::-1][:, :, :, flip_idx]
            hm_kp = (hm_kp[0:1] + fh) / 2.0
            hp_off = hp_off[0:1]

        return multi_pose_decode(
            self._mask_valid_region(jax.nn.sigmoid(hm), valid_hw),
            wh,
            kps,
            reg=reg,
            hm_hp=self._mask_valid_region(jax.nn.sigmoid(hm_kp), valid_hw),
            hp_offset=hp_off,
            k=self.decode_k,
        )

    @functools.cached_property
    def _infer_decode_jit(self):
        return jax.jit(self._infer_decode, static_argnames=("flip",))

    def prepare_image(self, img_hwc: np.ndarray, scale: float):
        """Same resize/pad/normalize as detection (centernet_multi_pose.py:160-185)."""
        h, w = img_hwc.shape[:2]
        new_h, new_w = int(h * scale), int(w * scale)
        th, tw = tta_pad_dims(new_h, new_w, self.padding)
        # reference top/left placement; bucket padding bottom/right only
        # (see detection.prepare_image)
        pad_tb = (pad_to_tta_size(new_h, self.padding) - new_h) // 2
        pad_lr = (pad_to_tta_size(new_w, self.padding) - new_w) // 2
        img = jax.image.resize(
            jnp.asarray(img_hwc, jnp.float32), (new_h, new_w, 3), "bilinear"
        )
        img = jnp.pad(
            img,
            ((pad_tb, th - new_h - pad_tb), (pad_lr, tw - new_w - pad_lr),
             (0, 0)),
        )
        img = (img - jnp.asarray(self.mean)) / jnp.asarray(self.std)
        meta = {
            "scale": [new_w / w, new_h / h],
            "padding": [pad_lr, pad_tb],
            # decode-mask boundary (see detection.prepare_image)
            "valid_hw": [
                pad_to_tta_size(new_h, self.padding) // self.down_ratio,
                pad_to_tta_size(new_w, self.padding) // self.down_ratio,
            ],
        }
        return img[None], meta

    def predict(self, variables, img_hwc: np.ndarray) -> np.ndarray:
        """Full TTA prediction -> [n, 57] rows (bbox4, score, kps34, class,
        hm_score17) in original-image coords
        (reference test_step_end, centernet_multi_pose.py:215-264)."""
        detections = []
        for scale in self.test_scales:
            images, meta = self.prepare_image(img_hwc, scale)
            if self.test_flip:
                images = jnp.concatenate([images, images[:, :, ::-1]], axis=0)
            det = np.array(
                self._infer_decode_jit(
                    variables, images, self.test_flip,
                    jnp.asarray([meta["valid_hw"]], jnp.int32),
                )[0]
            )

            padding = np.array(meta["padding"], np.float32)
            sc = np.array(meta["scale"], np.float32)
            det[:, :4] *= self.down_ratio
            det[:, :4] -= np.concatenate([padding, padding])
            det[:, :4] /= np.concatenate([sc, sc])

            pts = det[:, 5 : 5 + self.num_joints * 2].reshape(-1, self.num_joints, 2)
            pts = pts * self.down_ratio
            pts = pts - padding
            pts = pts / sc
            det[:, 5 : 5 + self.num_joints * 2] = pts.reshape(
                -1, self.num_joints * 2
            )
            detections.append(det)

        results = np.concatenate(detections, axis=0)
        if len(self.test_scales) > 1:
            keep = soft_nms_39(results, Nt=0.5, method=2)
            results = results[keep]

        scores = results[:, 4]
        if len(scores) > self.test_max_per_image:
            kth = len(scores) - self.test_max_per_image
            thresh = np.partition(scores, kth)[kth]
            results = results[results[:, 4] >= thresh]
        return results

    # -- batched fixed-shape serving path ------------------------------------------
    # (prepare_image_fixed geometry lives on the CenterNet base — shared
    # with the detection task)

    def predict_batch(
        self, variables, images: "jnp.ndarray", metas: List[dict],
        infer_fn=None,
    ) -> List[np.ndarray]:
        """Batched single-scale pose inference: one device round trip for
        the whole batch, host-side per-image unpadding. Returns the same
        [n, 57] row format as ``predict`` (bbox4, score, kps34, class,
        hm_score17), ready for ``to_coco_format``. ``infer_fn`` overrides
        the jitted forward+decode (e.g. the spatially-sharded one from
        ``parallel.spatial.make_spatial_infer``)."""
        if infer_fn is None:
            full = [
                images.shape[1] // self.down_ratio,
                images.shape[2] // self.down_ratio,
            ]
            valid = jnp.asarray(
                [m.get("valid_hw", full) for m in metas], jnp.int32
            )
            dets = np.array(
                self._infer_decode_jit(variables, images, False, valid)
            )
        else:
            dets = np.array(infer_fn(variables, images))
        results = []
        for det, meta in zip(dets, metas):
            padding = np.array(meta["padding"], np.float32)
            sc = np.array(meta["scale"], np.float32)
            det[:, :4] *= self.down_ratio
            det[:, :4] -= np.concatenate([padding, padding])
            det[:, :4] /= np.concatenate([sc, sc])
            pts = det[:, 5 : 5 + self.num_joints * 2].reshape(
                -1, self.num_joints, 2
            )
            pts = (pts * self.down_ratio - padding) / sc
            det[:, 5 : 5 + self.num_joints * 2] = pts.reshape(
                -1, self.num_joints * 2
            )
            results.append(det)
        return results

    def to_coco_format(self, image_id, results: np.ndarray) -> List[dict]:
        """-> COCO keypoint result dicts (centernet_multi_pose.py:270-296)."""
        out = []
        for det in results:
            kps = np.concatenate(
                [
                    np.asarray(det[5 : 5 + self.num_joints * 2], np.float32).reshape(
                        -1, 2
                    ),
                    np.ones((self.num_joints, 1), np.float32),
                ],
                axis=1,
            ).reshape(-1)
            out.append(
                {
                    "image_id": int(image_id),
                    "category_id": 1,
                    "bbox": [
                        float(det[0]),
                        float(det[1]),
                        float(det[2] - det[0]),
                        float(det[3] - det[1]),
                    ],
                    "score": float(det[4]),
                    "keypoints": [float(v) for v in kps],
                }
            )
        return out
