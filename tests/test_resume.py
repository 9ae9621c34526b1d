"""Trainer resume-from-checkpoint (Lightning ``ckpt_path`` resume semantics,
reference Trainer usage centernet_test.py:72-74): fit one epoch with a
checkpoint callback, resume, and verify the step counter / epoch position /
optimizer state continue instead of restarting."""

import os

import numpy as np

from centernet_tpu import CenterNetDetection
from centernet_tpu.data import (
    CategoryIdToClass,
    CenterDetectionSample,
    ComposeSample,
    ImageAugmentation,
    Identity,
    Normalize,
)
from centernet_tpu.data.loader import DataLoader
from centernet_tpu.parallel.mesh import make_mesh
from centernet_tpu.parallel.trainer import CheckpointCallback, Trainer

from tests.utilities import CocoFakeDataset

SIZE = 64


def _pipeline():
    return ComposeSample(
        [
            ImageAugmentation(
                Identity(),
                Normalize(CenterNetDetection.mean, CenterNetDetection.std),
            ),
            CategoryIdToClass(CenterNetDetection.valid_ids),
            CenterDetectionSample(),
        ]
    )


def _make_trainer(tmp_path, max_epochs):
    task = CenterNetDetection("res_18", learning_rate=1e-4)
    cb = CheckpointCallback(
        dirpath=str(tmp_path / "ckpts"), save_top_k=1, every_n_epochs=1
    )
    return Trainer(
        task,
        mesh=make_mesh(),
        max_epochs=max_epochs,
        limit_train_batches=2,
        checkpoint=cb,
    )


def test_fit_resume_continues(tmp_path):
    dataset = CocoFakeDataset(transforms=_pipeline(), length=16, size=SIZE)
    loader = DataLoader(dataset, batch_size=8, num_workers=0, shuffle=False)

    trainer = _make_trainer(tmp_path, max_epochs=1)
    trainer.init_state(input_hw=(SIZE, SIZE))
    state1 = trainer.fit(loader)
    assert int(state1.step) == 2  # 2 train batches
    last = os.path.join(str(tmp_path / "ckpts"), "last")
    assert os.path.isdir(last)
    assert os.path.exists(last + ".meta.json")
    # snapshot epoch-0's checkpoint (later fits overwrite "last")
    import shutil

    snap = str(tmp_path / "snap")
    shutil.copytree(last, snap)
    shutil.copy(last + ".meta.json", snap + ".meta.json")

    # Resume into a fresh trainer asked for 2 total epochs: it must start at
    # epoch 1 (not rerun epoch 0) and continue the step counter 2 -> 4.
    trainer2 = _make_trainer(tmp_path, max_epochs=2)
    trainer2.init_state(input_hw=(SIZE, SIZE))
    state2 = trainer2.fit(loader, resume_from=snap)
    assert int(state2.step) == 4

    # Resuming with max_epochs == already-completed epochs trains 0 steps.
    trainer3 = _make_trainer(tmp_path, max_epochs=1)
    trainer3.init_state(input_hw=(SIZE, SIZE))
    state3 = trainer3.fit(loader, resume_from=snap)
    assert int(state3.step) == 2

    # Optimizer state round-trips (adam mu for some leaf is preserved).
    import jax

    mu1 = jax.tree_util.tree_leaves(state1.opt_state)
    mu3 = jax.tree_util.tree_leaves(state3.opt_state)
    assert len(mu1) == len(mu3)
    for a, b in zip(mu1, mu3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_restore_across_topologies(tmp_path):
    """A checkpoint saved under the 8-device mesh must restore into a
    1-device state (train-on-pod -> eval-on-single-chip): the abstract
    restore tree carries the TARGET's shardings so orbax re-shards."""
    from centernet_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    task8 = CenterNetDetection("res_18")
    tr8 = Trainer(task8, mesh=make_mesh())  # 8 virtual devices
    state8 = tr8.init_state(input_hw=(SIZE, SIZE))
    path = str(tmp_path / "ckpt8")
    save_checkpoint(path, state8)

    task1 = CenterNetDetection("res_18")
    tr1 = Trainer(task1, mesh=make_mesh(n_data=1))  # single device
    state1 = tr1.init_state(input_hw=(SIZE, SIZE))
    restored = restore_checkpoint(path, state1)

    import jax

    a = jax.tree_util.tree_leaves(state8.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
    # restored leaves live on the 1-device sharding
    lead = jax.tree_util.tree_leaves(restored.params)[0]
    assert len(lead.sharding.device_set) == 1
