"""Custom-VJP stencil DCN gradients vs autodiff of the exact gather path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centernet_tpu.ops.dcn import dcn_v2, stencil_deform_conv


def _setup(seed=0, B=1, H=10, C=4, CO=6, off_scale=0.8):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32))
    off = jnp.asarray((rng.randn(B, H, H, 18) * off_scale).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, H, H, 9).astype(np.float32))
    w = jnp.asarray((rng.randn(9 * C, CO) * 0.2).astype(np.float32))
    b = jnp.asarray(rng.randn(CO).astype(np.float32))
    return x, off, mask, w, b


def test_stencil_forward_matches_exact():
    x, off, mask, w, b = _setup()
    e = np.asarray(dcn_v2(x, off, mask, w, b))
    s = np.asarray(stencil_deform_conv(x, off, mask, w, b, radius=3))
    np.testing.assert_allclose(s, e, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("argnum,name", [(0, "x"), (1, "offsets"), (2, "mask"),
                                         (3, "weight"), (4, "bias")])
def test_stencil_custom_vjp_matches_exact_autodiff(argnum, name):
    x, off, mask, w, b = _setup()

    def loss_exact(*args):
        return jnp.sum(jnp.sin(dcn_v2(*args)))

    def loss_stencil(*args):
        return jnp.sum(jnp.sin(stencil_deform_conv(*args, radius=3)))

    args = (x, off, mask, w, b)
    g_exact = np.asarray(jax.grad(loss_exact, argnums=argnum)(*args))
    g_sten = np.asarray(jax.grad(loss_stencil, argnums=argnum)(*args))
    scale = max(np.abs(g_exact).max(), 1e-3)
    np.testing.assert_allclose(
        g_sten / scale, g_exact / scale, atol=2e-4,
        err_msg=f"grad wrt {name}",
    )


def test_stencil_offset_grad_zero_beyond_clip():
    x, off, mask, w, b = _setup()
    off = jnp.full_like(off, 5.0)  # beyond radius=3 -> clipped, zero grad

    def loss(o):
        return jnp.sum(stencil_deform_conv(x, o, mask, w, b, radius=3) ** 2)

    g = np.asarray(jax.grad(loss)(off))
    np.testing.assert_array_equal(g, 0.0)
