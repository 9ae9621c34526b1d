"""Task layer: CenterNet base + detection + multi-pose."""

from .base import CenterNet, CenterNetModel
from .detection import CenterNetDetection
from .multi_pose import CenterNetMultiPose

__all__ = [
    "CenterNet",
    "CenterNetModel",
    "CenterNetDetection",
    "CenterNetMultiPose",
]
