"""Spatially-sharded inference — the CNN analog of sequence parallelism.

The reference has no equivalent: its only scaling axis is Lightning DDP
data parallelism (SURVEY.md §2 parallelism table lists SP/TP as absent),
so its minimum serving latency is one image on one GPU. On TPU, XLA's
GSPMD partitioner natively supports spatially partitioned convolutions:
sharding the image/feature H axis over the ``model`` mesh axis makes every
conv exchange only its kernel-halo rows with ICI neighbours
(collective-permute), so ONE image's forward pass can ride N chips — the
latency axis data parallelism cannot touch. The banded deformable conv
partitions the same way (its row-shift ``dynamic_slice`` halos and its
selection einsums are local in H; the clamp bounds the halo at
``radius + pad`` rows), and the decode top-k gathers the tiny
``[B, K]``-bound score tensors globally.

No custom collectives are written here — the shardings below are the whole
implementation; XLA inserts the halo exchanges. Verified bit-exact against
the single-device path for res/resdcn/dla backbones on a virtual mesh in
``tests/test_spatial_sharding.py``.
"""

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dcn import no_pallas_dcn

__all__ = ["make_spatial_infer", "spatial_image_sharding"]


def spatial_image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC image sharding: batch over ``data``, image rows over ``model``."""
    return NamedSharding(mesh, P("data", "model", None, None))


def make_spatial_infer(task, mesh: Mesh, flip: bool = False) -> Callable:
    """Jit the task's fused forward+decode with batch sharded over ``data``
    and the image H axis sharded over ``model``.

    Returns ``fn(variables, images) -> [B, K, D]`` detections (replicated
    over ``model``, sharded over ``data``). ``images`` must have batch
    divisible by the ``data`` axis and H divisible by the ``model`` axis
    (the jit-boundary requirement; internal feature maps may be uneven —
    GSPMD pads shards). For balanced work prefer H divisible by
    ``model_axis * deepest_stride`` (32 for res/resdcn/dla).

    ``flip`` mirrors the single-device flip-TTA contract
    (``task._infer_decode``): images is a [2·B, H, W, 3] concat of the
    batch and its horizontal mirror. The flip axis is W — unsharded — so
    flip-averaging stays shard-local.
    """
    n_model = mesh.shape["model"]

    def _check(images):
        b, h = images.shape[0], images.shape[1]
        if b % mesh.shape["data"]:
            raise ValueError(
                f"batch {b} not divisible by data axis {mesh.shape['data']}"
            )
        if h % n_model:
            raise ValueError(
                f"image H {h} must be divisible by the model axis "
                f"({n_model}) for spatial sharding"
            )

    # The Pallas DCN fast path is opaque to GSPMD's spatial partitioner
    # (a pallas_call can't be split along H by sharding propagation);
    # force the XLA-native impl set, whose einsums/slices partition with
    # halo exchanges. Scoped to THIS function's traces via no_pallas_dcn()
    # — other jits in the process keep the Pallas path (round-4 advisor
    # finding: the previous os.environ mutation leaked process-wide).
    jitted = jax.jit(
        lambda v, x: task._infer_decode(v, x, flip),
        in_shardings=(NamedSharding(mesh, P()), spatial_image_sharding(mesh)),
        out_shardings=NamedSharding(mesh, P("data")),
    )

    def fn(variables, images):
        _check(images)
        with no_pallas_dcn():  # active during (lazy) tracing
            return jitted(variables, images)

    return fn
