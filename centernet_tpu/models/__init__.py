"""Model zoo + factory (reference: CenterNet/models/__init__.py:6-19).

``create_model("{family}_{depth}")`` returns a flax backbone module exposing
``out_channels`` and ``num_stacks`` attributes and a
``__call__(x, train) -> [feature_map, ...]`` (one stride-4 NHWC map per
supervision stack). Families: res | resdcn | dla | hourglass.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from .dla import DLASeg
from .heads import CenterHead, HeadConv
from .hourglass import HourglassNet
from .resnet import PoseResNet
from .resnet_dcn import PoseResNetDCN

_MODEL_FACTORY = {
    "res": lambda depth, dtype: PoseResNet(num_layers=depth, dtype=dtype),
    "resdcn": lambda depth, dtype: PoseResNetDCN(num_layers=depth, dtype=dtype),
    "dla": lambda depth, dtype: DLASeg(dtype=dtype),
    "hourglass": lambda depth, dtype: HourglassNet(dtype=dtype),
}


def create_model(arch: str, dtype: Any = jnp.float32):
    """Parse "{family}_{depth}" and build the backbone module
    (reference create_model, models/__init__.py:14-19)."""
    family = arch[: arch.find("_")] if "_" in arch else arch
    depth = int(arch[arch.find("_") + 1 :]) if "_" in arch else 0
    if family not in _MODEL_FACTORY:
        raise ValueError(f"unknown architecture family {family!r} (arch={arch!r})")
    return _MODEL_FACTORY[family](depth, dtype)


__all__ = [
    "create_model",
    "CenterHead",
    "HeadConv",
    "PoseResNet",
    "PoseResNetDCN",
    "DLASeg",
    "HourglassNet",
]
