"""Decode primitives and full ctdet / multi-pose decoders — pure XLA, NHWC.

Semantics mirror the reference decoders bit-for-bit:

* ``pseudo_nms`` — 3x3 max-pool keep-mask (reference: utils/decode.py:5-10).
* ``topk`` — per-class top-K then global top-K with class/ys/xs recovery
  (reference: utils/decode.py:13-28).
* ``topk_channel`` — per-channel top-K (reference: utils/decode.py:31-40).
* ``ctdet_decode`` — center + offset -> xyxy boxes, ``[B, K, 6]`` =
  (x1, y1, x2, y2, score, class) (reference: decode/ctdet.py:6-38).
* ``multi_pose_decode`` — person boxes + 17 regressed keypoints, refined by
  snapping to keypoint-heatmap peaks when close enough and inside the box;
  ``[B, K, 57]`` = bbox4 + score1 + kps34 + class1 + hm_score17
  (reference: decode/multi_pose.py:7-96).

Everything is fixed-shape and jittable — ``lax.top_k`` + gathers compile to a
single fused XLA computation so only the final ``[B, K, *]`` tensor leaves the
device. Measured on v5e (dla_34, 512^2, bf16), the XLA decode is ~0.5
ms/img = 3.1% of forward+decode wall time — re-measured in round 3 AFTER
the backbone sped up 1.6x (15.4 fwd vs 15.9 fwd+decode ms/img), so no
hand-written Pallas decode kernel is warranted; the DCN backbone op still
dominates (see ops/dcn_pallas.py).

Layout note: feature maps are NHWC. Flat peak indices are ``y*W + x`` exactly
as the reference computes them, so sample encoders, losses, and decode agree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .losses import gather_feat_nhwc


def pseudo_nms(heat, kernel: int = 3):
    """Keep only local maxima of a [B, H, W, C] heatmap (3x3 window)."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return jnp.where(hmax == heat, heat, 0.0)


def _top_k(x, k: int):
    """Exact top-k. On TPU, ``lax.top_k`` lowers to a FULL per-row sort
    (profiled: 0.84 ms/img of the dla_34 decode = 6% of total device
    time); ``lax.approx_max_k`` with ``recall_target=1.0`` uses the
    PartialReduce TPU op, is exact (values AND indices verified equal on
    random data), and measures 14.7x faster (0.072 vs 1.059 ms per
    [80, 16384] row-batch, k=100). Tie ORDER may differ from lax.top_k's
    — the reference's torch.topk tie order is equally unspecified, so the
    semantic contract (top-k by score) is preserved.

    ``lax.platform_dependent`` branches at LOWERING time (per platform),
    not at trace time: an artifact exported from a CPU host for
    platforms=['tpu'] still gets the PartialReduce path, and a
    multi-platform export carries both branches.
    """
    return jax.lax.platform_dependent(
        x,
        tpu=lambda x: jax.lax.approx_max_k(
            x, k, recall_target=1.0, aggregate_to_topk=True
        ),
        default=lambda x: jax.lax.top_k(x, k),
    )


def topk(scores, k: int = 40):
    """Two-stage top-K over a [B, H, W, C] score map.

    Returns (scores, inds, clses, ys, xs), each [B, K]; ``inds`` are flat
    ``y*W + x`` (reference: utils/decode.py:13-28).
    """
    b, h, w, c = scores.shape
    # per-class top-k over the spatial axis
    flat = jnp.transpose(scores, (0, 3, 1, 2)).reshape(b, c, h * w)
    cls_scores, cls_inds = _top_k(flat, k)  # [B, C, K]
    cls_ys = (cls_inds // w).astype(jnp.float32)
    cls_xs = (cls_inds % w).astype(jnp.float32)

    # global top-k over classes
    all_scores = cls_scores.reshape(b, c * k)
    top_scores, top_ind = _top_k(all_scores, k)  # [B, K]
    clses = (top_ind // k).astype(jnp.int32)

    def _gather(x):
        return jnp.take_along_axis(x.reshape(b, c * k), top_ind, axis=1)

    inds = _gather(cls_inds).astype(jnp.int32)
    ys = _gather(cls_ys)
    xs = _gather(cls_xs)
    return top_scores, inds, clses, ys, xs


def topk_channel(scores, k: int = 40):
    """Per-channel top-K: [B, H, W, C] -> each [B, C, K]
    (reference: utils/decode.py:31-40)."""
    b, h, w, c = scores.shape
    flat = jnp.transpose(scores, (0, 3, 1, 2)).reshape(b, c, h * w)
    top_scores, top_inds = _top_k(flat, k)
    ys = (top_inds // w).astype(jnp.float32)
    xs = (top_inds % w).astype(jnp.float32)
    return top_scores, top_inds.astype(jnp.int32), ys, xs


def ctdet_decode(heat, wh, reg=None, k: int = 100):
    """Decode detection outputs into ``[B, K, 6]`` detections.

    Args:
      heat: [B, H, W, num_classes] heatmap (already sigmoided).
      wh: [B, H, W, 2] width/height map.
      reg: optional [B, H, W, 2] sub-pixel offset map.
      k: number of detections.

    Returns [B, K, 6]: (x1, y1, x2, y2, score, class) in output-map coords.
    """
    b = heat.shape[0]
    heat = pseudo_nms(heat)
    scores, inds, clses, ys, xs = topk(heat, k=k)

    if reg is not None:
        reg = gather_feat_nhwc(reg, inds)  # [B, K, 2]
        xs = xs[..., None] + reg[..., 0:1]
        ys = ys[..., None] + reg[..., 1:2]
    else:
        xs = xs[..., None] + 0.5
        ys = ys[..., None] + 0.5

    wh = gather_feat_nhwc(wh, inds)  # [B, K, 2]
    clses = clses[..., None].astype(jnp.float32)
    scores = scores[..., None]
    bboxes = jnp.concatenate(
        [
            xs - wh[..., 0:1] / 2,
            ys - wh[..., 1:2] / 2,
            xs + wh[..., 0:1] / 2,
            ys + wh[..., 1:2] / 2,
        ],
        axis=2,
    )
    return jnp.concatenate([bboxes, scores, clses], axis=2)


def multi_pose_decode(heat, wh, kps, reg=None, hm_hp=None, hp_offset=None, k: int = 100):
    """Decode multi-pose outputs (reference: decode/multi_pose.py:7-96).

    Args:
      heat: [B, H, W, 1] person heatmap (sigmoided).
      wh: [B, H, W, 2].
      kps: [B, H, W, 2*J] center-relative keypoint regressions.
      reg: optional [B, H, W, 2] center offsets.
      hm_hp: optional [B, H, W, J] keypoint heatmap (sigmoided).
      hp_offset: optional [B, H, W, 2] keypoint sub-pixel offsets.

    Returns [B, K, 40] without ``hm_hp`` or [B, K, 40+J] with it:
    bbox4 + score1 + kps(2J) + class1 [+ hm_score J].

    Documented divergence (found by the real-oracle parity test,
    tests/test_reference_oracle.py): the reference lays out the trailing
    hm_score block with ``hm_score.view(batch, K, num_joints)`` on a
    [B, J, K]-contiguous tensor (decode/multi_pose.py:90) — a reshape where
    a transpose was meant, scrambling joint scores across detections. No
    reference consumer ever reads columns 39+ (multi_pose_post_process uses
    0-38, soft_nms_39 swaps 5:39), so the scramble is dead data there. We
    emit the correctly transposed [B, K, J] block instead; the oracle test
    asserts our block equals the reference's after unscrambling.
    """
    b = heat.shape[0]
    num_joints = kps.shape[-1] // 2

    heat = pseudo_nms(heat)
    scores, inds, clses, ys, xs = topk(heat, k=k)

    kps = gather_feat_nhwc(kps, inds)  # [B, K, 2J]
    kps_x = kps[..., 0::2] + xs[..., None]
    kps_y = kps[..., 1::2] + ys[..., None]
    kps = jnp.stack([kps_x, kps_y], axis=-1).reshape(b, k, num_joints * 2)

    if reg is not None:
        reg = gather_feat_nhwc(reg, inds)
        xs = xs[..., None] + reg[..., 0:1]
        ys = ys[..., None] + reg[..., 1:2]
    else:
        xs = xs[..., None] + 0.5
        ys = ys[..., None] + 0.5

    wh = gather_feat_nhwc(wh, inds)
    clses_f = clses[..., None].astype(jnp.float32)
    scores_c = scores[..., None]
    bboxes = jnp.concatenate(
        [
            xs - wh[..., 0:1] / 2,
            ys - wh[..., 1:2] / 2,
            xs + wh[..., 0:1] / 2,
            ys + wh[..., 1:2] / 2,
        ],
        axis=2,
    )

    if hm_hp is None:
        return jnp.concatenate([bboxes, scores_c, kps, clses_f], axis=2)

    # Keypoint refinement: snap each regressed joint to the nearest
    # above-threshold keypoint-heatmap peak if it lies inside the box and
    # within 0.3 * max(box_h, box_w).
    thresh = 0.1
    hm_hp = pseudo_nms(hm_hp)
    kps_jk = kps.reshape(b, k, num_joints, 2).transpose(0, 2, 1, 3)  # [B,J,K,2]

    hm_score, hm_inds, hm_ys, hm_xs = topk_channel(hm_hp, k=k)  # [B,J,K]
    if hp_offset is not None:
        hp_off = gather_feat_nhwc(hp_offset, hm_inds.reshape(b, -1))
        hp_off = hp_off.reshape(b, num_joints, k, 2)
        hm_xs = hm_xs + hp_off[..., 0]
        hm_ys = hm_ys + hp_off[..., 1]
    else:
        hm_xs = hm_xs + 0.5
        hm_ys = hm_ys + 0.5

    mask = (hm_score > thresh).astype(jnp.float32)
    hm_score = (1.0 - mask) * -1.0 + mask * hm_score
    hm_ys = (1.0 - mask) * -10000.0 + mask * hm_ys
    hm_xs = (1.0 - mask) * -10000.0 + mask * hm_xs

    hm_kps = jnp.stack([hm_xs, hm_ys], axis=-1)  # [B,J,K,2] (peaks)
    # [B,J,K(reg),K(peak)] pairwise distances
    dist = jnp.sqrt(
        jnp.sum(
            jnp.square(kps_jk[:, :, :, None, :] - hm_kps[:, :, None, :, :]), axis=-1
        )
    )
    min_dist = jnp.min(dist, axis=3)  # [B,J,K]
    min_ind = jnp.argmin(dist, axis=3)  # [B,J,K]

    hm_score = jnp.take_along_axis(hm_score, min_ind, axis=2)[..., None]  # [B,J,K,1]
    min_dist = min_dist[..., None]
    snapped = jnp.take_along_axis(
        hm_kps, min_ind[..., None].repeat(2, axis=-1), axis=2
    )  # [B,J,K,2]

    l = bboxes[:, :, 0].reshape(b, 1, k, 1)
    t = bboxes[:, :, 1].reshape(b, 1, k, 1)
    r = bboxes[:, :, 2].reshape(b, 1, k, 1)
    d = bboxes[:, :, 3].reshape(b, 1, k, 1)
    invalid = (
        (snapped[..., 0:1] < l)
        | (snapped[..., 0:1] > r)
        | (snapped[..., 1:2] < t)
        | (snapped[..., 1:2] > d)
        | (hm_score < thresh)
        | (min_dist > jnp.maximum(d - t, r - l) * 0.3)
    ).astype(jnp.float32)

    hm_score_out = (hm_score * (1.0 - invalid)).reshape(b, num_joints, k)
    hm_score_out = hm_score_out.transpose(0, 2, 1)  # [B,K,J]

    inv2 = jnp.broadcast_to(invalid, (b, num_joints, k, 2))
    kps_ref = (1.0 - inv2) * snapped + inv2 * kps_jk
    kps_out = kps_ref.transpose(0, 2, 1, 3).reshape(b, k, num_joints * 2)

    return jnp.concatenate(
        [bboxes, scores_c, kps_out, clses_f, hm_score_out], axis=2
    )
