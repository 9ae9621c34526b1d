"""Compute ops: losses, decode, gaussian target rendering, NMS, DCNv2."""

from .gaussian import (
    gaussian_radius,
    splat_umich,
    splat_msra,
    scatter_max_channels,
)
from .losses import (
    sigmoid_clamped,
    focal_loss,
    reg_l1_loss,
    reg_weighted_l1_loss,
    gather_feat_nhwc,
)
from .decode import (
    pseudo_nms,
    topk,
    topk_channel,
    ctdet_decode,
    multi_pose_decode,
)

__all__ = [
    "gaussian_radius",
    "splat_umich",
    "splat_msra",
    "scatter_max_channels",
    "sigmoid_clamped",
    "focal_loss",
    "reg_l1_loss",
    "reg_weighted_l1_loss",
    "gather_feat_nhwc",
    "pseudo_nms",
    "topk",
    "topk_channel",
    "ctdet_decode",
    "multi_pose_decode",
]
