"""Distributed-correctness tests (the gap the reference never filled —
SURVEY.md §4): a data-parallel step over an 8-device mesh must produce the
same loss and parameters as the same global batch on one device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centernet_tpu import CenterNetDetection
from centernet_tpu.data import (
    CategoryIdToClass,
    CenterDetectionSample,
    ComposeSample,
    Identity,
    ImageAugmentation,
    Normalize,
)
from centernet_tpu.data.loader import default_collate
from centernet_tpu.parallel.mesh import make_mesh
from centernet_tpu.parallel.trainer import Trainer

SIZE = 64


def _batch(task, n):
    pipeline = ComposeSample(
        [
            ImageAugmentation(Identity(), Normalize(task.mean, task.std)),
            CategoryIdToClass(task.valid_ids),
            CenterDetectionSample(),
        ]
    )
    anns = [
        {"bbox": [8.0, 10.0, 20.0, 24.0], "category_id": 1},
        {"bbox": [30.0, 6.0, 16.0, 22.0], "category_id": 18},
    ]
    samples = []
    for i in range(n):
        img = (255 * np.random.RandomState(i).rand(SIZE, SIZE, 3)).astype(
            np.uint8
        )
        samples.append(pipeline(img, [dict(a) for a in anns]))
    return default_collate(samples)


def _run_one_step(n_devices, arch="res_18"):
    task = CenterNetDetection(arch, learning_rate=1e-3)
    mesh = make_mesh(n_data=n_devices)
    trainer = Trainer(task, mesh=mesh)
    trainer.init_state(input_hw=(SIZE, SIZE))
    trainer._compile_steps()
    batch = trainer._put_batch(_batch(task, 8))

    # gradients of the same global batch (reduction-order differences only)
    def loss_fn(params, img, target):
        outputs = task.model.apply(
            {"params": params, "batch_stats": trainer.state.batch_stats},
            img,
            False,
        )
        loss, _ = task.loss(outputs, target)
        return loss

    grads = jax.jit(jax.grad(loss_fn))(trainer.state.params, *batch)
    state, stats = trainer._train_step(trainer.state, batch)
    return grads, state, {k: float(v) for k, v in stats.items()}


def test_data_parallel_matches_single_device():
    grads8, state8, stats8 = _run_one_step(8)
    grads1, state1, stats1 = _run_one_step(1)

    # identical loss on the same global batch
    np.testing.assert_allclose(stats8["loss"], stats1["loss"], rtol=1e-4)
    assert int(state8.step) == int(state1.step) == 1

    # gradients agree up to cross-shard reduction order
    l8 = jax.tree_util.tree_leaves(grads8)
    l1 = jax.tree_util.tree_leaves(grads1)
    assert len(l8) == len(l1)
    for a, b in zip(l8, l1):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4)


@pytest.mark.slow
def test_data_parallel_matches_single_device_dcn():
    """Same 8-dev vs 1-dev gate for a DCN family (VERDICT r4 weak #4):
    the banded deformable conv's TRAIN path — per-tap selection einsums
    under lax.scan with the hand VJP (ops/dcn.py banded_deform_conv_vjp,
    the production default) — has to compile and stay grad-exact under
    batch sharding, not just the plain-conv res_18 path. resdcn_18 at
    64^2 exercises all three DCN+deconv stages (reference
    resnet_dcn.py:202-210 semantics) on the 8-device CPU mesh."""
    grads8, state8, stats8 = _run_one_step(8, "resdcn_18")
    grads1, state1, stats1 = _run_one_step(1, "resdcn_18")

    np.testing.assert_allclose(stats8["loss"], stats1["loss"], rtol=1e-4)
    assert int(state8.step) == int(state1.step) == 1
    l8 = jax.tree_util.tree_leaves(grads8)
    l1 = jax.tree_util.tree_leaves(grads1)
    assert len(l8) == len(l1)
    for a, b in zip(l8, l1):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4)


def test_metrics_are_global_not_per_shard():
    """The focal-loss normalizer counts positives over the GLOBAL batch —
    sharding must not change the value (the `sync_dist=True` analog)."""
    _, _, stats8 = _run_one_step(8)
    _, _, stats1 = _run_one_step(1)
    for k in ("hm_loss", "wh_loss", "off_loss"):
        np.testing.assert_allclose(stats8[k], stats1[k], rtol=1e-4, err_msg=k)
