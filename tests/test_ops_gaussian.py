"""Gaussian rendering ops vs. numpy oracle of the reference semantics."""

import math

import numpy as np
import jax.numpy as jnp

from centernet_tpu.ops.gaussian import (
    gaussian_radius,
    scatter_max_channels,
    splat_msra,
    splat_umich,
)
from tests.reference_numpy import (
    draw_msra_gaussian_np,
    draw_umich_gaussian_np,
    gaussian_radius_np,
)


def test_gaussian_radius_matches_reference():
    rng = np.random.RandomState(0)
    hs = rng.uniform(0.5, 200, 64)
    ws = rng.uniform(0.5, 200, 64)
    got = np.asarray(gaussian_radius(hs, ws))
    want = np.array([gaussian_radius_np((h, w)) for h, w in zip(hs, ws)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_umich_splat_matches_reference_loop():
    rng = np.random.RandomState(1)
    H = W = 128
    n = 32
    centers = rng.randint(0, 128, size=(n, 2)).astype(np.int32)
    radii = rng.randint(0, 30, size=(n,)).astype(np.int32)
    valid = rng.rand(n) > 0.2
    classes = rng.randint(0, 8, size=(n,)).astype(np.int32)

    per_obj = np.asarray(splat_umich(centers, radii, valid, (H, W)))
    got = np.asarray(scatter_max_channels(jnp.asarray(per_obj), classes, 8))

    want = np.zeros((8, H, W), np.float32)
    for i in range(n):
        if not valid[i]:
            continue
        draw_umich_gaussian_np(want[classes[i]], centers[i], int(radii[i]))
    want = want.transpose(1, 2, 0)

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_umich_border_clipping():
    # Center at the corner: gaussian must be clipped, not wrapped.
    per = np.asarray(
        splat_umich(
            np.array([[0, 0]], np.int32),
            np.array([5], np.int32),
            np.array([True]),
            (32, 32),
        )
    )[0]
    want = np.zeros((32, 32), np.float32)
    draw_umich_gaussian_np(want, (0, 0), 5)
    np.testing.assert_allclose(per, want, rtol=1e-5, atol=1e-6)
    assert per[0, 0] == 1.0
    assert per[:, 6:].max() == 0.0  # outside the radius window


def test_msra_splat_matches_reference_loop():
    rng = np.random.RandomState(2)
    H = W = 128
    n = 40
    centers = rng.randint(0, 128, size=(n, 2)).astype(np.int32)
    sigmas = rng.uniform(0.5, 8.0, size=(n,)).astype(np.float32)
    valid = np.ones(n, bool)

    got = np.asarray(splat_msra(centers, sigmas, valid, (H, W)))

    for i in range(n):
        want = np.zeros((H, W), np.float32)
        draw_msra_gaussian_np(want, centers[i], float(sigmas[i]))
        np.testing.assert_allclose(
            got[i], want, rtol=1e-4, atol=1e-5,
            err_msg=f"obj {i} center={centers[i]} sigma={sigmas[i]}",
        )


def test_msra_oob_window_is_skipped():
    # Window leaves the image -> reference skips the splat entirely.
    got = np.asarray(
        splat_msra(
            np.array([[2, 64]], np.int32),
            np.array([3.0], np.float32),
            np.array([True]),
            (128, 128),
        )
    )[0]
    assert got.max() == 0.0
