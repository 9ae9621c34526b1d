"""banded_deform_conv: forward parity with the stencil contract + gradient
parity with the stencil custom VJP (same clamped-offset semantics, match:
reference DCNv2 pose_dla_dcn.py:441-449 within the documented clamp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centernet_tpu.ops.dcn import (
    CLIP_EPS,
    banded_deform_conv,
    banded_deform_conv_vjp,
    dcn_v2,
    stencil_deform_conv,
)

H, W, C, CO = 16, 16, 8, 8


def _args(seed=0, b=2):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((b, H, W, C)), jnp.float32),
        jnp.asarray(rng.uniform(-6, 6, (b, H, W, 18)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (b, H, W, 9)), jnp.float32),
        jnp.asarray(rng.standard_normal((9 * C, CO)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(CO) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize("radius", [2, 4])
@pytest.mark.parametrize("unroll", [False, True])
def test_banded_forward_matches_stencil(radius, unroll):
    a = _args()
    got = np.array(
        banded_deform_conv(*a, 3, 1, 1, 1, radius, unroll_taps=unroll)
    )
    ref = np.array(stencil_deform_conv(*a, 3, 1, 1, 1, radius))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=1e-5 * scale, rtol=1e-5)


def test_banded_acc_dtype_knob():
    """acc32=False (CENTERNET_TPU_DCN_ACC=bf16) changes only the
    accumulation dtype of the selection einsums: bit-identical for f32
    inputs (acc dtype == compute dtype either way) and within bf16
    rounding (~2^-8 rel) of the f32-accumulated form for bf16 inputs."""
    a = _args(seed=5)
    ref = np.array(banded_deform_conv(*a, 3, 1, 1, 1, 4, unroll_taps=True))
    got = np.array(
        banded_deform_conv(*a, 3, 1, 1, 1, 4, unroll_taps=True, acc32=False)
    )
    np.testing.assert_array_equal(got, ref)

    ab = (a[0].astype(jnp.bfloat16), a[1], a[2],
          a[3].astype(jnp.bfloat16), a[4])
    refb = np.array(
        banded_deform_conv(*ab, 3, 1, 1, 1, 4, unroll_taps=True),
        np.float32,
    )
    gotb = np.array(
        banded_deform_conv(*ab, 3, 1, 1, 1, 4, unroll_taps=True,
                           acc32=False),
        np.float32,
    )
    scale = np.abs(refb).max()
    np.testing.assert_allclose(gotb, refb, atol=1.5e-2 * scale)


def test_banded_stacked_weight_matmul_matches(monkeypatch):
    """CENTERNET_TPU_DCN_WMM=stack (one deep [.., KK*Ci] @ [KK*Ci, Co]
    matmul over tap-stacked columns) must match the per-tap dots."""
    a = _args(seed=11)
    ref = np.array(banded_deform_conv(*a, 3, 1, 1, 1, 4, unroll_taps=True))
    monkeypatch.setenv("CENTERNET_TPU_DCN_WMM", "stack")
    got = np.array(banded_deform_conv(*a, 3, 1, 1, 1, 4, unroll_taps=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=1e-5 * scale, rtol=1e-5)


@pytest.mark.parametrize("tap_mode", ["unroll", "fused"])
def test_dcn_v2_tap_modes_match_scan(tap_mode):
    """The unrolled / single-fused-gather tap modes of the exact gather
    impl must be bit-compatible with the lax.scan form (they reorder
    only f32-accumulated additions of identical terms)."""
    a = _args(seed=9)
    ref = np.array(dcn_v2(*a, 3, 1, 1, 1, tap_mode="scan"))
    got = np.array(dcn_v2(*a, 3, 1, 1, 1, tap_mode=tap_mode))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-6 * scale, rtol=2e-6)


@pytest.mark.parametrize("unroll", [False, True])
def test_banded_narrowing_channels_matches_stencil(unroll):
    """Ci > Co (the DLA proj / resdcn deconv narrowing shapes) must match
    the stencil within f32 matmul tolerance. (A channel-folded variant that
    pre-applied tap weights was measured 2.4x slower in training and
    rejected — see BENCHMARKS.md; this keeps the shape coverage.)"""
    rng = np.random.default_rng(5)
    b, ci, co = 2, 12, 4
    a = (
        jnp.asarray(rng.standard_normal((b, H, W, ci)), jnp.float32),
        jnp.asarray(rng.uniform(-6, 6, (b, H, W, 18)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (b, H, W, 9)), jnp.float32),
        jnp.asarray(rng.standard_normal((9 * ci, co)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32),
    )
    got = np.array(banded_deform_conv(*a, 3, 1, 1, 1, 4, unroll_taps=unroll))
    ref = np.array(stencil_deform_conv(*a, 3, 1, 1, 1, 4))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale, rtol=2e-5)


def test_banded_narrowing_channels_grads():
    """Offset gradients at zero init must stay non-zero (forward-difference
    contract) on Ci > Co shapes."""
    rng = np.random.default_rng(6)
    b, ci, co = 1, 6, 3
    x = jnp.asarray(rng.standard_normal((b, H, W, ci)), jnp.float32)
    off0 = jnp.zeros((b, H, W, 18), jnp.float32)
    mask = jnp.asarray(rng.uniform(0.2, 1, (b, H, W, 9)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((9 * ci, co)) * 0.1, jnp.float32)
    bias = jnp.zeros(co, jnp.float32)

    def loss(off):
        return jnp.sum(
            jnp.sin(banded_deform_conv(x, off, mask, wgt, bias, 3, 1, 1, 1, 4))
        )

    g = np.asarray(jax.grad(loss)(off0))
    assert np.abs(g).max() > 1e-3, (
        "narrowing-channel path lost the offset gradient at zero init"
    )


def test_banded_grads_match_stencil_vjp():
    a = _args(seed=1, b=1)

    def loss(op):
        def f(x, o, m, w, bi):
            return jnp.sum(op(x, o, m, w, bi, 3, 1, 1, 1, 4) ** 2)

        return jax.grad(f, argnums=(0, 1, 2, 3))(*a)

    g_b = loss(banded_deform_conv)
    g_s = loss(stencil_deform_conv)
    for name, u, v in zip(("dx", "doffsets", "dmask", "dweight"), g_b, g_s):
        u, v = np.array(u), np.array(v)
        scale = max(np.abs(v).max(), 1e-6)
        np.testing.assert_allclose(
            u, v, atol=5e-4 * scale, rtol=1e-3, err_msg=name
        )


def test_banded_offset_gradient_at_zero_init():
    """DCNv2 offsets are ZERO-initialized; the op must propagate a nonzero
    offset gradient there or offsets never learn.  The reference CUDA
    kernel's coordinate gradient at integer sample points is the forward
    difference of the feature map (dmcn_get_coordinate_weight); the
    tent-form relu(1-|t-s|) stencil has subgradient 0 at integers and
    silently froze offsets (round-1 flaw).  Gate: banded's gradient at
    offsets == 0 is nonzero and matches a right-sided finite difference."""
    rng = np.random.default_rng(3)
    b, h, w, c, co = 1, 8, 8, 4, 4
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    off0 = jnp.zeros((b, h, w, 18), jnp.float32)
    mask = jnp.asarray(rng.uniform(0.2, 1.0, (b, h, w, 9)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((9 * c, co)) * 0.1, jnp.float32)
    bias = jnp.zeros(co, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, h, w, co)), jnp.float32)

    def f(off):
        return jnp.sum(
            banded_deform_conv(x, off, mask, wgt, bias, 3, 1, 1, 1, 4) * cot
        )

    g = np.array(jax.grad(f)(off0))
    assert np.abs(g).max() > 1e-3, "offset gradient vanished at zero init"

    # right-sided directional finite difference (positive direction matches
    # the floor-form right-derivative at integer points)
    u = jnp.asarray(rng.uniform(0.0, 1.0, off0.shape), jnp.float32)
    eps = 1e-3
    fd = (float(f(off0 + eps * u)) - float(f(off0))) / eps
    analytic = float(jnp.sum(jnp.asarray(g) * u))
    np.testing.assert_allclose(fd, analytic, rtol=5e-2)


def test_banded_wide_feature_maps():
    """banded has no width restriction (unlike the Pallas kernel)."""
    rng = np.random.default_rng(2)
    b, h, w, c = 1, 8, 160, 4
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.uniform(-3, 3, (b, h, w, 18)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (b, h, w, 9)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((9 * c, 4)) * 0.1, jnp.float32)
    bias = jnp.zeros(4, jnp.float32)
    got = np.array(banded_deform_conv(x, off, mask, wgt, bias, 3, 1, 1, 1, 4))
    ref = np.array(stencil_deform_conv(x, off, mask, wgt, bias, 3, 1, 1, 1, 4))
    np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max(),
                               rtol=1e-5)


def test_fine_map_radius_default():
    """The per-scale clamp default (r=4 coarse / r=2 on maps >= 96 cells,
    certified by the 512^2 skew study in BENCHMARKS.md): the DCN MODULE on
    a fine map must clamp exactly like an explicit radius-2 kernel, and on
    a coarse map like radius 4; RADIUS_FINE=off restores the global clamp.
    """
    import os

    from centernet_tpu.ops.dcn import DCN

    rng = np.random.default_rng(11)
    c = 4
    m = DCN(features=c, dtype=jnp.float32)
    inputs = {
        hw: jnp.asarray(rng.standard_normal((1, hw, hw, c)), jnp.float32)
        for hw in (96, 32)
    }
    vs = m.init(jax.random.PRNGKey(0), inputs[96])
    params = dict(vs["params"])
    com = dict(params["conv_offset_mask"])
    # non-zero offset bias so offsets reach well past +-2 and the clamp
    # radius actually changes the output
    com["bias"] = jnp.asarray(
        rng.uniform(-5, 5, com["bias"].shape), jnp.float32
    )
    params["conv_offset_mask"] = com
    variables = {"params": params}

    def module_out(hw, **env):
        old = {k: os.environ.get(k) for k in env}
        os.environ.update({k: str(v) for k, v in env.items()})
        try:
            return np.asarray(m.apply(variables, inputs[hw]))
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    # fine map (96 cells): default must equal an explicit global radius 2
    out_fine = module_out(96, CENTERNET_TPU_DCN_IMPL="banded")
    out_fine_r2 = module_out(
        96, CENTERNET_TPU_DCN_IMPL="banded",
        CENTERNET_TPU_DCN_RADIUS="2", CENTERNET_TPU_DCN_RADIUS_FINE="off",
    )
    out_fine_off = module_out(
        96, CENTERNET_TPU_DCN_IMPL="banded",
        CENTERNET_TPU_DCN_RADIUS_FINE="off",
    )
    np.testing.assert_allclose(out_fine, out_fine_r2, atol=1e-5)
    assert np.abs(out_fine - out_fine_off).max() > 1e-4, (
        "radius 4 vs 2 must differ through a +-5 offset bias"
    )

    # coarse map (32 cells): fine clamp must NOT apply (equals global r=4)
    out_coarse = module_out(32, CENTERNET_TPU_DCN_IMPL="banded")
    out_coarse_r4 = module_out(
        32, CENTERNET_TPU_DCN_IMPL="banded",
        CENTERNET_TPU_DCN_RADIUS_FINE="off",
    )
    np.testing.assert_allclose(out_coarse, out_coarse_r4, atol=1e-5)


def test_training_moves_dcn_offsets():
    """System-level gate on the offset-gradient fix: a few optimizer steps
    on a DCN model must move the (zero-initialized) offset-conv parameters
    away from zero — round 1's tent-form gradients left them frozen."""
    import jax

    from centernet_tpu import CenterNetDetection
    from centernet_tpu.data import (
        CategoryIdToClass,
        ComposeSample,
        ImageAugmentation,
        Identity,
        Normalize,
        PaddedAnnotationSample,
    )
    from centernet_tpu.data.loader import DataLoader
    from centernet_tpu.parallel.mesh import make_mesh
    from centernet_tpu.parallel.trainer import Trainer

    from tests.utilities import CocoFakeDataset

    task = CenterNetDetection("resdcn_18", learning_rate=1e-3)
    pipe = ComposeSample(
        [
            ImageAugmentation(Identity(), Normalize(task.mean, task.std)),
            CategoryIdToClass(task.valid_ids),
            PaddedAnnotationSample(),
        ]
    )
    ds = CocoFakeDataset(transforms=pipe, length=8, size=64)
    loader = DataLoader(ds, batch_size=8, num_workers=0, shuffle=False)
    trainer = Trainer(task, mesh=make_mesh(), max_epochs=3,
                      limit_train_batches=1)
    trainer.init_state(input_hw=(64, 64))
    state = trainer.fit(loader)

    moved = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        keys = [getattr(k, "key", "") for k in path]
        if "conv_offset_mask" in keys:
            moved = max(moved, float(np.abs(np.asarray(leaf)).max()))
    assert moved > 1e-6, "DCN offset conv never moved from zero init"


@pytest.mark.parametrize("radius", [2, 4])
@pytest.mark.parametrize("unroll", [False, True])
def test_banded_dy_stack_forward_matches(radius, unroll):
    """dy_stack=True (CENTERNET_TPU_DCN_STACK, round-4 one-dot-per-tap
    form) is numerically equivalent to the per-(tap,dy) baseline: shifts
    outside a tap's ±r window carry exactly-zero wy weights."""
    a = _args(seed=7)
    ref = np.array(
        banded_deform_conv(*a, 3, 1, 1, 1, radius, unroll_taps=unroll)
    )
    got = np.array(
        banded_deform_conv(
            *a, 3, 1, 1, 1, radius, unroll_taps=unroll, dy_stack=True
        )
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=1e-5 * scale, rtol=1e-5)


@pytest.mark.parametrize("radius", [2, 4])
def test_banded_hand_vjp_forward_identical(radius):
    """banded_deform_conv_vjp's primal IS the banded forward (same code
    path) — bit-identical."""
    a = _args(seed=13)
    ref = np.array(banded_deform_conv(*a, 3, 1, 1, 1, radius))
    got = np.array(banded_deform_conv_vjp(*a, 3, 1, 1, 1, radius, True))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("boundary", [False, True])
@pytest.mark.parametrize("radius", [1, 2, 4])
def test_banded_hand_vjp_grads_match_autodiff(radius, boundary):
    """The hand backward (CENTERNET_TPU_DCN_BWD=vjp) must reproduce the
    autodiff-banded gradients for every input: x, offsets, mask, weight,
    bias. ``boundary=True`` pins a block of offsets EXACTLY onto the clamp
    bounds — the common case in production, where the module-level
    straight-through clamp lands every out-of-range offset on the
    boundary. autodiff of jnp.clip (minimum(hi, maximum(lo, x))) splits
    tie gradients 0.5/0.5, and the hand VJP must match: the 2x gradient a
    naive inclusive pass-through gave pinned offsets measurably degraded
    training (r=1 64^2 train->AP gate: hm_loss 0.006 autodiff vs 0.67)."""
    rng = np.random.default_rng(17)
    b, ci, co = 1, 6, 5
    x = jnp.asarray(rng.standard_normal((b, H, W, ci)), jnp.float32)
    off_np = rng.uniform(
        -radius + 0.05, radius - 0.1, (b, H, W, 18)
    ).astype(np.float32)
    if boundary:
        # exact ties on both bounds, mixed with interior values
        off_np[:, ::2, :, 0::3] = np.float32(-radius)
        off_np[:, :, ::2, 1::3] = np.float32(radius) - np.float32(CLIP_EPS)
    off = jnp.asarray(off_np)
    mask = jnp.asarray(rng.uniform(0, 1, (b, H, W, 9)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((9 * ci, co)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32)

    def grads(op, *extra):
        def f(x, o, m, w, bi):
            return jnp.sum(jnp.sin(op(x, o, m, w, bi, 3, 1, 1, 1, radius,
                                      *extra)))

        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(x, off, mask, wgt, bias)

    g_ref = grads(banded_deform_conv)
    g_vjp = grads(banded_deform_conv_vjp, True)
    for name, u, v in zip(
        ("dx", "doffsets", "dmask", "dweight", "dbias"), g_vjp, g_ref
    ):
        u, v = np.array(u), np.array(v)
        scale = max(np.abs(v).max(), 1e-6)
        np.testing.assert_allclose(
            u, v, atol=2e-5 * scale, rtol=2e-5, err_msg=name
        )


def test_banded_hand_vjp_offset_gradient_at_zero_init():
    """Zero-init offsets must receive the forward-difference gradient
    through the hand backward too (the round-1 tent-form trap)."""
    rng = np.random.default_rng(19)
    b, hh, ww, c, co = 1, 8, 8, 4, 4
    x = jnp.asarray(rng.standard_normal((b, hh, ww, c)), jnp.float32)
    off0 = jnp.zeros((b, hh, ww, 18), jnp.float32)
    mask = jnp.asarray(rng.uniform(0.2, 1.0, (b, hh, ww, 9)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((9 * c, co)) * 0.1, jnp.float32)
    bias = jnp.zeros(co, jnp.float32)

    def f(op, *extra):
        def loss(off):
            return jnp.sum(
                jnp.sin(op(x, off, mask, wgt, bias, 3, 1, 1, 1, 4, *extra))
            )

        return np.array(jax.grad(loss)(off0))

    g_vjp = f(banded_deform_conv_vjp, True)
    g_ref = f(banded_deform_conv)
    assert np.abs(g_vjp).max() > 1e-3
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_vjp, g_ref, atol=2e-5 * scale, rtol=2e-5)


def test_banded_hand_vjp_bf16_grads_close():
    """bf16 compute + bf16 accumulation (the production train config):
    hand-VJP grads track the autodiff-banded bf16 grads within bf16
    reduction tolerance."""
    rng = np.random.default_rng(23)
    b, ci, co = 1, 8, 8
    x = jnp.asarray(rng.standard_normal((b, H, W, ci)), jnp.bfloat16)
    off = jnp.asarray(rng.uniform(-1.9, 1.9, (b, H, W, 18)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (b, H, W, 9)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((9 * ci, co)) * 0.1, jnp.bfloat16)
    bias = jnp.zeros(co, jnp.bfloat16)

    def grads(op, *extra):
        def f(x, o, m, w):
            return jnp.sum(
                op(x, o, m, w, bias, 3, 1, 1, 1, 2, *extra).astype(
                    jnp.float32
                )
                ** 2
            )

        return jax.grad(f, argnums=(0, 1, 2, 3))(x, off, mask, wgt)

    g_ref = grads(banded_deform_conv)
    g_vjp = grads(banded_deform_conv_vjp, False)
    for name, u, v in zip(("dx", "doffsets", "dmask", "dweight"),
                          g_vjp, g_ref):
        u = np.array(u, np.float32)
        v = np.array(v, np.float32)
        scale = max(np.abs(v).max(), 1e-6)
        np.testing.assert_allclose(
            u, v, atol=2e-2 * scale, err_msg=name
        )


def test_banded_dy_stack_grads_match():
    """Gradients of the dy-stacked form match the baseline banded autodiff
    (x, offsets, mask, weight all receive identical gradients)."""
    x, off, mask, wgt, bias = _args(seed=9, b=1)

    def loss(form):
        def f(x, off, mask, wgt):
            return jnp.sum(
                jnp.sin(
                    banded_deform_conv(
                        x, off, mask, wgt, bias, 3, 1, 1, 1, 2,
                        dy_stack=form,
                    )
                )
            )
        return jax.grad(f, argnums=(0, 1, 2, 3))(x, off, mask, wgt)

    g_ref = loss(False)
    g_stack = loss(True)
    for gr, gs, name in zip(g_ref, g_stack, ("x", "off", "mask", "w")):
        scale = max(np.abs(np.array(gr)).max(), 1e-6)
        np.testing.assert_allclose(
            np.array(gs), np.array(gr), atol=2e-5 * scale, rtol=2e-5,
            err_msg=name,
        )
