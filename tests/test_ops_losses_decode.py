"""Losses and decode primitives vs. numpy oracle of the reference semantics."""

import numpy as np
import jax.numpy as jnp

from centernet_tpu.ops.decode import ctdet_decode, pseudo_nms, topk
from centernet_tpu.ops.losses import (
    focal_loss,
    gather_feat_nhwc,
    reg_l1_loss,
    reg_weighted_l1_loss,
    sigmoid_clamped,
)
from tests.reference_numpy import ctdet_decode_np, focal_loss_np, nms_np, topk_np


def test_sigmoid_clamped():
    x = np.array([-100.0, 0.0, 100.0], np.float32)
    y = np.asarray(sigmoid_clamped(x))
    np.testing.assert_allclose(y, [1e-4, 0.5, 1 - 1e-4], rtol=1e-6)


def test_focal_loss_matches_reference():
    rng = np.random.RandomState(3)
    gt = np.zeros((2, 16, 16, 4), np.float32)
    # some exact-1 positives plus gaussian tails
    for _ in range(10):
        b, y, x, c = rng.randint(0, [2, 16, 16, 4])
        gt[b, y, x, c] = 1.0
    gt += rng.rand(2, 16, 16, 4).astype(np.float32) * 0.5
    gt = np.clip(gt, 0, 1.0)
    pred = np.clip(rng.rand(2, 16, 16, 4).astype(np.float32), 1e-4, 1 - 1e-4)

    got = float(focal_loss(pred, gt))
    want = focal_loss_np(pred.astype(np.float64), gt.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_focal_loss_no_positives():
    gt = np.zeros((1, 8, 8, 2), np.float32)
    pred = np.full((1, 8, 8, 2), 0.3, np.float32)
    got = float(focal_loss(pred, gt))
    want = focal_loss_np(pred.astype(np.float64), gt.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=5e-4)


def test_reg_l1_loss():
    rng = np.random.RandomState(4)
    out = rng.randn(2, 16, 16, 2).astype(np.float32)
    ind = rng.randint(0, 256, size=(2, 12)).astype(np.int32)
    mask = (rng.rand(2, 12) > 0.4)
    target = rng.randn(2, 12, 2).astype(np.float32)

    got = float(reg_l1_loss(out, mask, ind, target))

    pred = out.reshape(2, 256, 2)
    pred = np.take_along_axis(pred, ind[..., None], axis=1)
    m = np.repeat(mask[..., None], 2, axis=2).astype(np.float32)
    want = np.abs(pred * m - target * m).sum() / (m.sum() + 1e-4)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reg_weighted_l1_loss():
    rng = np.random.RandomState(5)
    out = rng.randn(2, 16, 16, 34).astype(np.float32)
    ind = rng.randint(0, 256, size=(2, 12)).astype(np.int32)
    mask = (rng.rand(2, 12, 34) > 0.6)
    target = rng.randn(2, 12, 34).astype(np.float32)

    got = float(reg_weighted_l1_loss(out, mask, ind, target))

    pred = out.reshape(2, 256, 34)
    pred = np.take_along_axis(pred, ind[..., None], axis=1)
    m = mask.astype(np.float32)
    want = np.abs(pred * m - target * m).sum() / (m.sum() + 1e-4)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pseudo_nms_matches_maxpool():
    rng = np.random.RandomState(6)
    heat = rng.rand(2, 32, 32, 3).astype(np.float32)
    got = np.asarray(pseudo_nms(heat))
    want = nms_np(heat)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_topk_matches_reference():
    rng = np.random.RandomState(7)
    # distinct values to avoid tie-order ambiguity between backends
    vals = rng.permutation(2 * 16 * 16 * 5).astype(np.float32)
    scores = vals.reshape(2, 16, 16, 5) / vals.size
    s, inds, clses, ys, xs = topk(scores, k=20)
    s2, inds2, clses2, ys2, xs2 = topk_np(scores, 20)
    np.testing.assert_allclose(np.asarray(s), s2, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(inds), inds2)
    np.testing.assert_array_equal(np.asarray(clses), clses2)
    np.testing.assert_allclose(np.asarray(ys), ys2)
    np.testing.assert_allclose(np.asarray(xs), xs2)


def test_ctdet_decode_matches_reference():
    rng = np.random.RandomState(8)
    vals = rng.permutation(32 * 32 * 4).astype(np.float32)
    heat = (vals.reshape(1, 32, 32, 4) / vals.size).astype(np.float32)
    wh = rng.rand(1, 32, 32, 2).astype(np.float32) * 10
    reg = rng.rand(1, 32, 32, 2).astype(np.float32)

    got = np.asarray(ctdet_decode(heat, wh, reg, k=50))
    want = ctdet_decode_np(heat, wh, reg, k=50)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gather_feat_nhwc():
    rng = np.random.RandomState(9)
    feat = rng.randn(2, 8, 8, 3).astype(np.float32)
    ind = rng.randint(0, 64, (2, 5)).astype(np.int32)
    got = np.asarray(gather_feat_nhwc(feat, ind))
    flat = feat.reshape(2, 64, 3)
    want = np.take_along_axis(flat, ind[..., None], axis=1)
    np.testing.assert_array_equal(got, want)
