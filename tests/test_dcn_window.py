"""Floating-window DCN fast path vs the exact gather path."""

import numpy as np
import jax.numpy as jnp

from centernet_tpu.ops.dcn import dcn_v2, window_deform_conv


def _setup(seed=0, B=2, H=16, C=8, CO=12, off_scale=1.0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32))
    offsets = jnp.asarray(
        (rng.randn(B, H, H, 18) * off_scale).astype(np.float32)
    )
    mask = jnp.asarray(rng.rand(B, H, H, 9).astype(np.float32))
    w = jnp.asarray((rng.randn(9 * C, CO) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(CO).astype(np.float32))
    return x, offsets, mask, w, b


def test_window_matches_exact_gather_small_offsets():
    # Differential-offset budget of the window-8 fast path is ~4 px across
    # the 9 taps of one position; 0.4-sigma offsets stay well inside.
    x, off, mask, w, b = _setup(off_scale=0.4)
    exact = np.asarray(dcn_v2(x, off, mask, w, b))
    fast = np.asarray(window_deform_conv(x, off, mask, w, b))
    np.testing.assert_allclose(fast, exact, rtol=1e-4, atol=1e-4)


def test_window_overflow_clamps_but_stays_finite():
    # Pathological tap spread exceeds the window: the fast path clamps
    # (documented divergence) but must stay finite and bounded.
    x, off, mask, w, b = _setup(off_scale=4.0)
    fast = np.asarray(window_deform_conv(x, off, mask, w, b))
    exact = np.asarray(dcn_v2(x, off, mask, w, b))
    assert np.isfinite(fast).all()
    # magnitudes comparable to the exact result
    assert np.abs(fast).max() <= np.abs(exact).max() * 3 + 10


def test_window_matches_exact_gather_large_uniform_offsets():
    # Large but per-position-uniform offsets: the floating window follows the
    # samples, so the fast path stays exact far outside the tap base.
    x, off, mask, w, b = _setup()
    shift = jnp.full(off.shape, 6.0)  # all taps shifted +6 px both axes
    off = off * 0.3 + shift
    exact = np.asarray(dcn_v2(x, off, mask, w, b))
    fast = np.asarray(window_deform_conv(x, off, mask, w, b))
    np.testing.assert_allclose(fast, exact, rtol=1e-4, atol=1e-4)


def test_window_zero_offsets_is_plain_conv():
    x, _, _, w, b = _setup()
    off = jnp.zeros((2, 16, 16, 18))
    mask = jnp.ones((2, 16, 16, 9))
    exact = np.asarray(dcn_v2(x, off, mask, w, b))
    fast = np.asarray(window_deform_conv(x, off, mask, w, b))
    np.testing.assert_allclose(fast, exact, rtol=1e-4, atol=1e-4)


def test_window_out_of_image_samples_are_zero():
    # Samples pushed fully outside the image must contribute exactly 0
    # (only the bias remains).
    x, _, _, w, b = _setup()
    off = jnp.full((2, 16, 16, 18), 100.0)
    mask = jnp.ones((2, 16, 16, 9))
    fast = np.asarray(window_deform_conv(x, off, mask, w, b))
    np.testing.assert_allclose(
        fast, np.broadcast_to(np.asarray(b), fast.shape), rtol=1e-5, atol=1e-5
    )


def test_window_gradients_flow():
    import jax

    x, off, mask, w, b = _setup(B=1, H=8)

    def loss(off_):
        return jnp.sum(window_deform_conv(x, off_, mask, w, b) ** 2)

    g = jax.grad(loss)(off)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
