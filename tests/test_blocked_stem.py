"""Space-to-depth blocked DLA stem (round 4): identical parameters and
identical math to the plain stem, at MXU-friendly operand shapes.

Reference for the stem structure: pose_dla_dcn.py:276-318 (base_layer 7x7
stride 1 + level0/level1 conv levels)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centernet_tpu.models.dla import (
    DLA,
    blocked_kernel_s1,
    blocked_kernel_s2,
    depth_to_space2,
    space_to_depth2,
)


@pytest.fixture
def stem_env(monkeypatch):
    def set_mode(mode):
        monkeypatch.setenv("CENTERNET_TPU_DLA_STEM", mode)

    return set_mode


def test_space_to_depth_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 6, 3)))
    np.testing.assert_array_equal(
        np.array(depth_to_space2(space_to_depth2(x))), np.array(x)
    )


@pytest.mark.parametrize("k", [3, 7])
def test_blocked_kernel_s1_equals_plain_conv(k):
    """conv(x, w, stride 1, same-pad) == unblock(conv(block(x), W'))."""
    rng = np.random.default_rng(k)
    ci, co = 3, 16
    x = jnp.asarray(rng.standard_normal((2, 16, 12, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.2, jnp.float32)
    p = k // 2
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    wb = blocked_kernel_s1(w)
    P = (wb.shape[0] - 1) // 2
    got = depth_to_space2(
        jax.lax.conv_general_dilated(
            space_to_depth2(x), wb, (1, 1), ((P, P), (P, P)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=1e-5, atol=1e-5)


def test_blocked_kernel_s2_equals_strided_conv():
    """conv(x, w, stride 2, pad 1) == conv(block(x), W'', pad (1,0))."""
    rng = np.random.default_rng(3)
    ci, co = 16, 32
    x = jnp.asarray(rng.standard_normal((2, 16, 12, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = jax.lax.conv_general_dilated(
        space_to_depth2(x), blocked_kernel_s2(w), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=1e-5, atol=1e-5)


def test_blocked_stem_param_tree_identical(stem_env):
    """Same paths, shapes AND init values as the plain stem — checkpoints
    and the torch importer see no difference."""
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    m = DLA(dtype=jnp.float32)
    stem_env("plain")
    vp = m.init(jax.random.PRNGKey(0), x, False)
    stem_env("blocked")
    vb = m.init(jax.random.PRNGKey(0), x, False)
    lp = jax.tree_util.tree_leaves_with_path(vp)
    lb = jax.tree_util.tree_leaves_with_path(vb)
    assert [str(k) for k, _ in lp] == [str(k) for k, _ in lb]
    for (k, a), (_, b) in zip(lp, lb):
        np.testing.assert_array_equal(np.array(a), np.array(b), err_msg=str(k))


def test_blocked_stem_forward_matches_plain(stem_env):
    """Full-DLA forward with the SAME variables under both stems. The stem
    output itself (outs[0]) matches to f32-reorder rounding; deeper levels
    drift through random-init BN amplification (documented ~3.5%/ulp
    sensitivity at init, BENCHMARKS.md), so they get scale-relative
    tolerances."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    m = DLA(dtype=jnp.float32)
    stem_env("plain")
    v = m.init(jax.random.PRNGKey(1), x, False)
    outs_p = m.apply(v, x, False)
    stem_env("blocked")
    outs_b = m.apply(v, x, False)
    assert [o.shape for o in outs_p] == [o.shape for o in outs_b]
    # stem output: tight
    np.testing.assert_allclose(
        np.array(outs_b[0]), np.array(outs_p[0]), rtol=1e-4, atol=1e-4
    )
    # downstream: loose, scale-relative
    for i in range(1, 6):
        scale = max(np.abs(np.array(outs_p[i])).max(), 1e-3)
        np.testing.assert_allclose(
            np.array(outs_b[i]), np.array(outs_p[i]),
            atol=2e-2 * scale, rtol=2e-2, err_msg=f"level {i}",
        )


def test_blocked_stem_train_batch_stats_match(stem_env):
    """Train-mode BN statistics reduce over the same positions in both
    layouts — the STEM layers' updated batch_stats agree tightly."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    m = DLA(dtype=jnp.float32)
    stem_env("plain")
    v = m.init(jax.random.PRNGKey(2), x, False)
    _, mp = m.apply(v, x, True, mutable=["batch_stats"])
    stem_env("blocked")
    _, mb = m.apply(v, x, True, mutable=["batch_stats"])
    for name in ("base_layer", "level0_0", "level1_0"):
        sp = mp["batch_stats"][name]["BatchNorm_0"]
        sb = mb["batch_stats"][name]["BatchNorm_0"]
        for leaf in ("mean", "var"):
            np.testing.assert_allclose(
                np.array(sb[leaf]), np.array(sp[leaf]),
                rtol=1e-4, atol=1e-5, err_msg=f"{name}/{leaf}",
            )


# NOTE: the odd-input fallback in DLA.__call__ is defensive only — every
# model-valid input is a multiple of 32 (the stride-32 pyramid and the
# (d|31)+1 eval pad rule), so it cannot be exercised end to end: odd sizes
# fail later in the Tree maxpool regardless of stem implementation.
