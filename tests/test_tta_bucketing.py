"""TTA shape bucketing (VERDICT r3 weak #3 / item 4): padded eval shapes
quantize up to multiples of 128 so a full-val2017 ``--flip --multi_scale``
run compiles a bounded set of XLA graphs instead of one per distinct image
size. Parity argument: the extra padding is zeros, and every layer treats
out-of-canvas as zero (conv zero-pad, DCN zero-outside-image), so the head
outputs over the reference-padded region are IDENTICAL — bucketing can only
add spurious padded-region candidates that unpad to out-of-image coords,
exactly the border effect the reference's own padding has
(centernet_detection.py:139-151)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centernet_tpu.tasks.detection import (
    CenterNetDetection,
    pad_to_tta_size,
    tta_pad_dims,
)


def test_bucket_quantizes_up_to_128(monkeypatch):
    monkeypatch.setenv("CENTERNET_TPU_TTA_BUCKET", "128")
    th, tw = tta_pad_dims(500, 333, 31)
    assert (th, tw) == (512, 384)
    # already a multiple: unchanged
    assert tta_pad_dims(511, 127, 31) == (512, 128)


def test_bucket_off_restores_reference_rule(monkeypatch):
    monkeypatch.setenv("CENTERNET_TPU_TTA_BUCKET", "0")
    for d in (100, 500, 511, 512):
        th, _ = tta_pad_dims(d, d, 31)
        assert th == pad_to_tta_size(d, 31)


def test_bucket_count_is_bounded_for_val2017_geometry(monkeypatch):
    """The whole val2017 x 5 scales x flip TTA sweep lands in a small
    graph set: every padded dim <= 1.5*640 quantizes to one of ~8 values
    per axis."""
    monkeypatch.setenv("CENTERNET_TPU_TTA_BUCKET", "128")
    dims = set()
    for d in range(64, 961):  # val2017 sides ~200-640, scales 0.5-1.5
        dims.add(tta_pad_dims(d, d, 31)[0])
    assert len(dims) <= 8, sorted(dims)


def test_decode_mask_excludes_bucket_margin():
    """The bucket margin is zero INPUT, not zero HEAD OUTPUT: a zero
    region still scores sigmoid(-2.19) ~= 0.1 through the heatmap head's
    bias prior, and the 3x3 maxpool pseudo-NMS keeps every cell of a
    constant plateau — so unmasked margins flood the fixed top-K pool
    with out-of-image candidates (round-4 advisor finding). The decode
    path must therefore zero scores outside meta['valid_hw']; real peaks
    BELOW the plateau level must still win."""
    from centernet_tpu.ops.decode import ctdet_decode
    from centernet_tpu.tasks.base import CenterNet

    b, h, w, c = 1, 64, 64, 3
    vh, vw = 40, 48  # reference-region extent in cells
    hm = np.full((b, h, w, c), 0.1, np.float32)  # the padded plateau
    hm[:, :vh, :vw, :] = 1e-4  # valid region floor
    # two real peaks inside the region, both WEAKER than the plateau
    hm[0, 10, 12, 1] = 0.05
    hm[0, 30, 33, 2] = 0.04
    wh = np.full((b, h, w, 2), 4.0, np.float32)
    reg = np.zeros((b, h, w, 2), np.float32)

    valid = jnp.asarray([[vh, vw]], jnp.int32)
    masked = CenterNet._mask_valid_region(jnp.asarray(hm), valid)
    dets = np.asarray(
        ctdet_decode(masked, jnp.asarray(wh), jnp.asarray(reg), k=10)
    )[0]
    xs = (dets[:, 0] + dets[:, 2]) / 2
    ys = (dets[:, 1] + dets[:, 3]) / 2
    assert (xs < vw).all() and (ys < vh).all(), "candidate outside region"
    assert dets[0, 4] == pytest.approx(0.05) and dets[1, 4] == pytest.approx(
        0.04
    )
    # sanity that the test bites: WITHOUT the mask the plateau wins top-K
    dets_un = np.asarray(
        ctdet_decode(jnp.asarray(hm), jnp.asarray(wh), jnp.asarray(reg), k=10)
    )[0]
    assert dets_un[:, 4].max() == pytest.approx(0.1)


@pytest.mark.slow
def test_bucketed_head_outputs_equal_on_valid_region(monkeypatch):
    """Forward the SAME normalized content on the reference-padded canvas
    and the bucketed canvas: head maps over the reference-padded region
    must match to float tolerance (zero padding is semantically inert)."""
    task = CenterNetDetection("res_18", dtype=jnp.float32)
    variables = task.init_variables(jax.random.PRNGKey(0), (128, 128))

    rng = np.random.default_rng(0)
    img = rng.random((150, 200, 3), np.float32)

    monkeypatch.setenv("CENTERNET_TPU_TTA_BUCKET", "0")
    ref_images, ref_meta = task.prepare_image(img, 1.0)
    monkeypatch.setenv("CENTERNET_TPU_TTA_BUCKET", "128")
    bkt_images, bkt_meta = task.prepare_image(img, 1.0)

    assert ref_images.shape[1:3] == (160, 224)
    assert bkt_images.shape[1:3] == (256, 256)
    # identical top/left placement: extra padding is bottom/right only, so
    # the unpad meta is IDENTICAL and the reference-canvas region of the
    # bucketed input matches bit for bit
    assert ref_meta == bkt_meta
    rh, rw = ref_images.shape[1:3]
    np.testing.assert_array_equal(
        np.array(bkt_images[0, :rh, :rw]), np.array(ref_images[0])
    )

    out_r = task.apply(variables, ref_images, train=False)[-1]
    out_b = task.apply(variables, bkt_images, train=False)[-1]
    d = task.down_ratio
    for name in ("heatmap", "width_height", "regression"):
        a = np.array(out_r[name][0])
        b = np.array(out_b[name][0])[: rh // d, : rw // d]
        # not bit-identical: XLA compiles a different graph per shape, so
        # f32 reduction orders differ (measured drift ~3.5e-5 relative
        # through 20 layers of init-mode BN); semantically the same map
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b, a, atol=5e-4 * scale, rtol=5e-4, err_msg=name
        )
