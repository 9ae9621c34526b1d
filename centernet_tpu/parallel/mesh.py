"""Device mesh + sharding utilities.

The reference delegates all distribution to PyTorch Lightning / NCCL DDP
(SURVEY.md §2 parallelism table). The TPU-native equivalent is explicit: a
``jax.sharding.Mesh`` over the chips with a ``data`` axis (data parallelism —
the only strategy the reference supports) plus a reserved ``model`` axis for
future tensor/spatial sharding. The jitted train step is compiled with
``NamedSharding`` constraints: batch sharded over ``data``, parameters
replicated; XLA inserts the gradient all-reduce (psum) over ICI
automatically — no hand-written collectives, no NCCL analog needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With ``n_model == 1`` (default) this is pure data parallelism — the
    layout the reference's DDP maps to. Device order follows
    ``jax.devices()`` so the data axis rides ICI neighbours first.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the batch axis sharded over ``data``."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
