"""CenterNet losses — pure-JAX, fixed-shape, NHWC.

Numerics mirror the reference exactly (CenterNet/utils/losses.py):

* ``focal_loss`` — CornerNet penalty-reduced focal loss (``_neg_loss``,
  losses.py:14-39) including the ``num_pos == 0`` branch.
* ``reg_l1_loss`` — L1 over features gathered at integer peak indices with an
  object mask broadcast over coordinates, normalized by ``mask.sum() + 1e-4``
  (``RegL1Loss``, losses.py:53-63).
* ``reg_weighted_l1_loss`` — same but with a per-coordinate mask (sparse
  keypoints) (``RegWeightedL1Loss``, losses.py:81-91).

Layout: feature maps are NHWC ``[B, H, W, C]``; ``ind`` holds flat ``y*W + x``
indices ``[B, N]``; targets are ``[B, N, C]``. All dense elementwise work maps
onto the VPU; gathers use ``take_along_axis`` which XLA lowers to dynamic
gathers fused with the surrounding arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_clamped(x, clamp: float = 1e-4):
    """Sigmoid clamped to [clamp, 1-clamp] (reference: utils/decode.py:43-45)."""
    return jnp.clip(jax.nn.sigmoid(x), clamp, 1.0 - clamp)


def focal_loss(pred, gt):
    """Penalty-reduced pixelwise focal loss.

    Args:
      pred: [B, H, W, C] probabilities in (0, 1) (already sigmoid-clamped).
      gt: [B, H, W, C] gaussian-rendered target heatmap.

    Returns: scalar loss.
    """
    pos = (gt == 1.0).astype(pred.dtype)
    neg = (gt < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1.0 - gt, 4)

    pos_loss = jnp.log(pred) * jnp.square(1.0 - pred) * pos
    neg_loss = jnp.log(1.0 - pred) * jnp.square(pred) * neg_weights * neg

    num_pos = pos.sum()
    pos_loss = pos_loss.sum()
    neg_loss = neg_loss.sum()

    # Reference branches on num_pos == 0 (losses.py:35-38); jnp.where keeps it
    # jittable. Guard the division so the untaken branch stays finite.
    return jnp.where(
        num_pos == 0,
        -neg_loss,
        -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0),
    )


def gather_feat_nhwc(feat, ind):
    """Gather per-index feature vectors from an NHWC map.

    Equivalent to the reference's ``_transpose_and_gather_feat``
    (utils/decode.py:59-63) — NHWC is already "transposed".

    Args:
      feat: [B, H, W, C].
      ind: [B, N] int flat indices ``y*W + x``.

    Returns: [B, N, C].
    """
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    return jnp.take_along_axis(flat, ind[..., None].astype(jnp.int32), axis=1)


def reg_l1_loss(output, mask, ind, target):
    """Masked L1 on gathered regressions (reference RegL1Loss, losses.py:53-63).

    Args:
      output: [B, H, W, C] prediction map.
      mask: [B, N] bool/int object mask.
      ind: [B, N] flat indices.
      target: [B, N, C] regression targets.
    """
    pred = gather_feat_nhwc(output, ind)
    m = mask.astype(pred.dtype)[..., None] * jnp.ones_like(pred)
    loss = jnp.abs(pred * m - target * m).sum()
    return loss / (m.sum() + 1e-4)


def reg_weighted_l1_loss(output, mask, ind, target):
    """Per-coordinate masked L1 (reference RegWeightedL1Loss, losses.py:81-91).

    Args:
      output: [B, H, W, C].
      mask: [B, N, C] per-coordinate mask.
      ind: [B, N] flat indices.
      target: [B, N, C].
    """
    pred = gather_feat_nhwc(output, ind)
    m = mask.astype(pred.dtype)
    loss = jnp.abs(pred * m - target * m).sum()
    return loss / (m.sum() + 1e-4)
