"""Pallas DCN kernel parity (TPU-only; CI's CPU mesh skips these).

The eval-time "auto" dispatch picks the Pallas lane-gather kernel on a
real TPU (ops/dcn.py); these gates pin its numerics against the banded
XLA forward under module semantics (pre-clamped offsets, both clamp
conventions identical). Run manually on a TPU host:

    JAX_PLATFORMS=tpu pytest tests/test_dcn_pallas.py
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centernet_tpu.ops.dcn import CLIP_EPS, DCN, banded_deform_conv

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas kernel needs a real TPU"
)


def _case(h, w, ci, co, r, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, h, w, ci)), dtype)
    off = jnp.clip(
        jnp.asarray(rng.uniform(-r - 1, r + 1, (2, h, w, 18)), jnp.float32),
        -r, r - CLIP_EPS,
    )
    mask = jnp.asarray(rng.uniform(0, 1, (2, h, w, 9)), jnp.float32)
    wgt = jnp.asarray(
        rng.standard_normal((9 * ci, co)) / np.sqrt(9 * ci), dtype
    )
    bias = jnp.asarray(rng.standard_normal(co) * 0.1, dtype)
    return x, off, mask, wgt, bias


@tpu_only
@pytest.mark.parametrize("shape", [(32, 32, 16, 16, 4), (64, 128, 8, 8, 2)])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_pallas_forward_matches_banded(shape, dtype):
    h, w, ci, co, r = shape
    dt = jnp.dtype(dtype)
    args = _case(h, w, ci, co, r, dt)
    ref = np.asarray(
        banded_deform_conv(*args, 3, 1, 1, 1, r, unroll_taps=True),
        np.float32,
    )
    from centernet_tpu.ops.dcn_pallas import pallas_deform_conv_fwd

    got = np.asarray(
        pallas_deform_conv_fwd(*args, 3, 1, 1, 1, radius=r), np.float32
    )
    scale = max(np.abs(ref).max(), 1e-6)
    tol = 2e-5 if dtype == "float32" else 2e-2
    np.testing.assert_allclose(got / scale, ref / scale, atol=tol, err_msg=dtype)


@tpu_only
def test_module_auto_dispatch_eval_matches_banded(monkeypatch):
    """Full DCN module (offset conv + straight-through clamp) eval forward:
    auto (-> pallas on TPU) vs forced banded."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 16)), jnp.float32)
    mod = DCN(features=16)
    variables = mod.init(jax.random.PRNGKey(0), x, True)
    # give the zero-init offset conv a real signal
    variables = jax.tree_util.tree_map(
        lambda t: t + 0.05 * jnp.asarray(
            np.random.default_rng(2).standard_normal(t.shape), t.dtype
        ),
        variables,
    )
    monkeypatch.setenv("CENTERNET_TPU_DCN_IMPL", "banded")
    ref = np.asarray(mod.apply(variables, x, False), np.float32)
    monkeypatch.setenv("CENTERNET_TPU_DCN_IMPL", "auto")
    monkeypatch.setenv("CENTERNET_TPU_DCN_PALLAS", "1")
    got = np.asarray(mod.apply(variables, x, False), np.float32)
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)
