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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DISTRIBUTED_INITIALIZED = False


def maybe_init_distributed() -> bool:
    """Initialize the multi-process JAX runtime when launched as one
    process per host (TPU slices / multi-host pods).

    Gated behind ``CENTERNET_TPU_DISTRIBUTED=1`` because
    ``jax.distributed.initialize`` blocks waiting for all processes — on a
    single-host run (the reference's single-node DDP equivalent) it must
    not be called.  On TPU pods JAX infers coordinator/process_id from the
    environment; explicit overrides via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID are honored when set.

    After initialization, ``jax.devices()`` spans every chip in the slice,
    so ``make_mesh()`` + the jitted train step transparently become
    multi-host data parallelism (global-batch semantics; XLA emits ICI/DCN
    collectives).  Returns True if initialization ran.
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    if os.environ.get("CENTERNET_TPU_DISTRIBUTED", "0") != "1":
        return False
    # jax.distributed.initialize must run BEFORE the backend comes up; a
    # prior jax.devices()/jit call would make multi-host init silently see
    # only local devices. Fail loudly instead (call maybe_init_distributed()
    # at CLI entry, which the cli/ modules do first thing).
    from jax._src import xla_bridge as _xb

    if getattr(_xb, "_backends", None):
        raise RuntimeError(
            "CENTERNET_TPU_DISTRIBUTED=1 but the JAX backend is already "
            "initialized — call maybe_init_distributed() before any other "
            "JAX use (jax.devices(), jit, weight import, ...)"
        )
    kwargs = {}
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = os.environ["JAX_COORDINATOR_ADDRESS"]
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _DISTRIBUTED_INITIALIZED = True
    return True


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With ``n_model == 1`` (default) this is pure data parallelism — the
    layout the reference's DDP maps to. Device order follows
    ``jax.devices()`` so the data axis rides ICI neighbours first.

    Multi-host: when ``CENTERNET_TPU_DISTRIBUTED=1`` the multi-process
    runtime is initialized first and the mesh spans the full slice.
    """
    maybe_init_distributed()
    devices = list(devices if devices is not None else jax.devices())
    # Process-major device order: batch row block [pi*per, (pi+1)*per) of a
    # `data`-sharded array must land on process pi's chips, matching the
    # DataLoader's per-process index slice and
    # jax.make_array_from_process_local_data in Trainer._put_batch.
    devices.sort(key=lambda d: (d.process_index, d.id))
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
