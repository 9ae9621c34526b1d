"""bf16 activation discipline: guard against silent f32 upcasts in-model.

Round 3's biggest perf bug was invisible to every numerics test: flax
``nn.BatchNorm`` promotes activations with its f32 scale/bias, so under
``dtype=bfloat16`` the whole network silently ran f32 activations —
doubling HBM traffic and turning the DCN selection einsums into multi-pass
f32 contractions (dla_34: 43.7 -> 70.2 img/s once fixed; BENCHMARKS.md
"round-3 headline"). These tests pin the fix at the layer level (every
BN-wrapped block returns the compute dtype, train AND eval) and sweep the
whole dla_34 graph's captured intermediates so a future reintroduction
anywhere in the model fails loudly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centernet_tpu.models.layers import (
    ConvBNAct,
    ConvTransposeBNAct,
)
from centernet_tpu.ops.dcn import DeformConvBNAct

BF16 = jnp.bfloat16


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize(
    "mod",
    [
        ConvBNAct(features=8, kernel_size=3, dtype=BF16),
        ConvTransposeBNAct(features=8, dtype=BF16),
        DeformConvBNAct(features=8, dtype=BF16),
    ],
    ids=lambda m: type(m).__name__,
)
def test_bn_blocks_return_compute_dtype(mod, train):
    x = jnp.ones((1, 16, 16, 8), BF16)
    variables = mod.init(jax.random.PRNGKey(0), x, True)
    y = mod.apply(
        variables, x, train,
        mutable=["batch_stats"] if train else False,
    )
    if train:
        y = y[0]
    assert y.dtype == BF16, f"{type(mod).__name__} returned {y.dtype}"


def test_dla34_has_no_f32_spatial_intermediates():
    """Sweep every captured intermediate of the bf16 dla_34 forward: no
    module may emit a big f32 spatial activation. Allowed f32: the head
    outputs (contract: heads return f32 for the loss/decode), the DCN
    offset/mask trio (small [..., 27] tensors kept f32 for the floor /
    one-hot position math), and matmul accumulators consumed in-module."""
    from centernet_tpu import CenterNetDetection

    size = 64
    task = CenterNetDetection("dla_34", dtype=BF16)
    variables = task.init_variables(jax.random.PRNGKey(0), (size, size))
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, size, size, 3), jnp.float32
    )

    _, state = task.model.apply(
        variables, x, False, capture_intermediates=True, mutable=["intermediates"]
    )

    offenders = []

    def walk(path, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(path + (k,), v)
            return
        for arr in jax.tree_util.tree_leaves(node):
            if not hasattr(arr, "dtype") or arr.ndim != 4:
                continue
            if arr.dtype != jnp.float32:
                continue
            name = "/".join(path)
            # heads are f32 by contract; the root sow is the model's
            # returned head dicts (same arrays)
            if "head_" in name or name == "__call__":
                continue
            # offset/mask conv outputs are small position tensors
            if "conv_offset_mask" in name:
                continue
            # nn.BatchNorm ITSELF returns f32 (flax promotes with the f32
            # scale/bias) — that inner sow is expected; the contract under
            # test is that the ENCLOSING block casts back before returning,
            # i.e. no f32 at any block boundary above the raw BN. Named raw
            # BNs (project_bn) are the same case.
            parts = [p for p in name.split("/") if p != "__call__"]
            leaf = parts[-1] if parts else name
            if leaf.startswith("BatchNorm_") or leaf.endswith("_bn"):
                continue
            # DeformConvBNAct's inner DCN (named "conv") returns its f32
            # matmul accumulator, consumed by the block's BN (which
            # computes in f32 anyway); the block boundary above it is
            # checked
            if leaf == "conv" and ("ida_" in name or "dla_up" in name
                                   or "deconv" in name):
                continue
            # big spatial f32 activation escaping a module boundary
            if arr.shape[1] >= 8 and arr.shape[2] >= 8 and arr.shape[3] >= 16:
                offenders.append((name, arr.shape))

    walk((), state["intermediates"])
    assert not offenders, offenders
