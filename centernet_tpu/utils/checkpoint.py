"""Checkpoint save/restore (orbax) + legacy torch weight import.

Covers the reference's three mechanisms (SURVEY.md §5):
1. Training checkpoints — orbax replaces Lightning's ModelCheckpoint files.
2. Resume/eval from checkpoint (reference centernet_test.py:72-74).
3. Legacy original-CenterNet torch weight import with head-key remapping
   (reference centernet.py:23-62): torch state_dicts are converted tensor by
   tensor into the flax variable tree (OIHW -> HWIO kernels, BN
   weight/bias/running stats -> scale/bias/mean/var).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


def save_checkpoint(path: str, state, meta: Optional[Dict[str, Any]] = None) -> None:
    """Save a TrainState pytree with orbax.

    ``meta`` (e.g. ``{"epoch": 3}``) is written as a JSON sidecar next to the
    orbax directory so ``Trainer.fit(resume_from=...)`` can continue the epoch
    loop — the Lightning-resume equivalent (reference: ``Trainer(resume_from
    _checkpoint=...)`` semantics via ckpt_path, centernet_test.py:72-74).
    """
    if ocp is None:
        raise RuntimeError("orbax-checkpoint is unavailable")
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        import json

        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def restore_checkpoint(path: str, target, with_meta: bool = False):
    """Restore a TrainState pytree saved by ``save_checkpoint``.

    ``target`` provides the tree structure/shapes (an abstract or concrete
    TrainState).  With ``with_meta=True`` returns ``(state, meta_dict)``.
    """
    if ocp is None:
        raise RuntimeError("orbax-checkpoint is unavailable")
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()

    def _abstract(x):
        # carry the TARGET's sharding so orbax re-shards on load — without
        # it a checkpoint can only be restored on the topology that saved
        # it (orbax falls back to the sharding file, which is topology-
        # specific: an 8-device-saved ckpt then fails in a 1-device
        # process, e.g. train-on-pod -> eval-on-single-chip)
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if hasattr(x, "dtype"):
            return jax.ShapeDtypeStruct(np.shape(x), x.dtype)
        return x

    abstract = jax.tree_util.tree_map(_abstract, target)
    state = ckptr.restore(path, abstract)
    if not with_meta:
        return state
    meta: Dict[str, Any] = {}
    if os.path.exists(path + ".meta.json"):
        import json

        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return state, meta


def load_checkpoint_hparams(path: str) -> Optional[Dict[str, Any]]:
    """Read the task hyperparameters persisted in a checkpoint's
    ``.meta.json`` sidecar (written by ``Trainer.fit``'s checkpoint callback).
    Returns None for checkpoints without hparams (pre-sidecar saves)."""
    sidecar = os.path.abspath(path) + ".meta.json"
    if not os.path.exists(sidecar):
        return None
    import json

    with open(sidecar) as f:
        meta = json.load(f)
    return meta.get("hparams")


# ---------------------------------------------------------------------------
# Legacy torch-weight import
# ---------------------------------------------------------------------------

# Original-repo head names -> decoupled head names (reference centernet.py:24-31).
HEAD_KEY_MAPPING = {
    "hm": "heatmap",
    "wh": "width_height",
    "reg": "regression",
    "hm_hp": "heatmap_keypoints",
    "hp_offset": "heatmap_keypoints_offset",
    "hps": "keypoints",
}


def torch_tensor_to_numpy(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def convert_conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into {name: ndarray} (strips 'module.')."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {
        k.replace("module.", ""): torch_tensor_to_numpy(v) for k, v in sd.items()
    }


def split_backbone_and_heads(state_dict: Mapping[str, np.ndarray]):
    """Split a legacy CenterNet state_dict into backbone vs head params and
    rename head keys (reference centernet.py:34-61)."""
    backbone = {}
    heads: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in state_dict.items():
        parts = k.split(".")
        head_key = parts[0]
        if head_key in HEAD_KEY_MAPPING:
            heads.setdefault(HEAD_KEY_MAPPING[head_key], {})[
                ".".join(parts[1:])
            ] = v
        else:
            backbone[k] = v
    return backbone, heads
