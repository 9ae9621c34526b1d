"""AOT serving export: freeze a task's batched inference function (forward
+ fused on-device decode, weights baked in) into a portable StableHLO
artifact via ``jax.export``.

This is the TPU-native deployment story the reference delegates to
torch checkpoint + Python (reference centernet_test.py:72-84 re-builds the
whole module graph to serve): here the serving graph is compiled AHEAD of
time, carries its weights as constants, and can be loaded and executed by
any runtime with a StableHLO consumer — no model code, no Python class
registry, no pickle. The artifact pins input shape/dtype and the target
platform(s); loading re-jits in one call.

Format: a single file —
    8-byte magic  b"CNTPUEX1"
    then the ``jax.export`` serialized bytes.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp

_MAGIC = b"CNTPUEX1"


def make_serving_fn(task, variables) -> Callable:
    """The fixed-shape batched serving computation: normalized NHWC float
    images -> decoded detections (weights closed over).

    Detection: [B, K, 6] rows (x1, y1, x2, y2, score, class) in
    feature-grid coords (multiply by ``task.down_ratio`` for input-pixel
    coords — same contract as the in-process batched path,
    tasks/detection.py predict_batch). Multi-pose: [B, K, 40+] rows.
    """

    def serve(images):
        return task._infer_decode(variables, images, False)

    return serve


def export_serving(
    task,
    variables,
    path: str,
    *,
    input_size: int = 512,
    batch: int = 8,
    platforms: Optional[Sequence[str]] = None,
) -> "jax.export.Exported":
    """Export the serving function for fixed ``[batch, size, size, 3]``
    inputs and write the artifact to ``path``. Returns the Exported."""
    from jax import export as jexport

    serve = make_serving_fn(task, variables)
    spec = jax.ShapeDtypeStruct(
        (batch, input_size, input_size, 3), jnp.float32
    )
    exp = jexport.export(
        jax.jit(serve),
        platforms=list(platforms) if platforms else None,
    )(spec)
    blob = exp.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(blob)
    os.replace(tmp, path)
    return exp


def load_serving(path: str) -> Callable:
    """Load an exported serving artifact; returns a callable
    ``images [B, S, S, 3] float32 -> decoded detections`` that jit-executes
    the embedded StableHLO on the current backend."""
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(
                f"{path} is not a centernet_tpu serving artifact "
                f"(bad magic {magic!r})"
            )
        exp = jexport.deserialize(bytearray(f.read()))

    def call(images):
        return exp.call(images)

    info = {
        "in_avals": [str(a) for a in exp.in_avals],
        "platforms": list(exp.platforms),
    }
    call.exported = exp  # type: ignore[attr-defined]
    call.info = info  # type: ignore[attr-defined]
    return call


__all__: List[str] = ["make_serving_fn", "export_serving", "load_serving"]
