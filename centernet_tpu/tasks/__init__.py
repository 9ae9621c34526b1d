"""Task layer: CenterNet base + detection + multi-pose."""

from .base import CenterNet, CenterNetModel
from .detection import CenterNetDetection
from .multi_pose import CenterNetMultiPose

TASK_REGISTRY = {
    "CenterNetDetection": CenterNetDetection,
    "CenterNetMultiPose": CenterNetMultiPose,
}


def task_from_hparams(hparams, **overrides):
    """Reconstruct a task from persisted checkpoint hyperparameters
    (``CenterNet.hparams()``), the Lightning ``load_from_checkpoint``
    equivalent (reference centernet_test.py:72-74). ``overrides`` supplies
    load-time choices (TTA test_scales/test_flip, dtype) that are not
    persisted."""
    hp = dict(hparams)
    name = hp.pop("task")
    try:
        cls = TASK_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown task {name!r} in checkpoint hparams "
            f"(known: {sorted(TASK_REGISTRY)})"
        ) from None
    hp.update(overrides)
    return cls(**hp)


__all__ = [
    "CenterNet",
    "CenterNetModel",
    "CenterNetDetection",
    "CenterNetMultiPose",
    "TASK_REGISTRY",
    "task_from_hparams",
]
