"""Module import sweep (the reference CI's --doctest-modules side effect —
catches import errors in every module) + orbax checkpoint round-trip."""

import importlib
import os
import pkgutil

import numpy as np
import pytest

import centernet_tpu


def test_all_modules_import():
    failures = []
    for mod in pkgutil.walk_packages(
        centernet_tpu.__path__, prefix="centernet_tpu."
    ):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # pragma: no cover
            failures.append((mod.name, repr(e)))
    assert not failures, failures


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from centernet_tpu import CenterNetDetection
    from centernet_tpu.parallel.mesh import make_mesh
    from centernet_tpu.parallel.trainer import Trainer
    from centernet_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    task = CenterNetDetection("res_18")
    trainer = Trainer(task, mesh=make_mesh(n_data=1))
    state = trainer.init_state(input_hw=(64, 64))

    path = os.path.join(tmp_path, "ckpt")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, state)

    orig = jax.tree_util.tree_leaves(state.params)
    back = jax.tree_util.tree_leaves(restored.params)
    assert len(orig) == len(back)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_checkpoint_callback_top_k(tmp_path):
    from centernet_tpu.parallel.trainer import CheckpointCallback

    saved = []

    def fake_save(path):
        os.makedirs(path, exist_ok=True)
        saved.append(path)

    cb = CheckpointCallback(
        dirpath=str(tmp_path), save_top_k=2, every_n_epochs=1, save_last=True
    )
    for epoch, loss in enumerate([5.0, 3.0, 4.0, 1.0]):
        cb.on_epoch_end(epoch, {"val_loss": loss}, fake_save)

    kept = sorted(d for d in os.listdir(tmp_path) if d != "last")
    assert len(kept) == 2
    # best two are losses 1.0 (epoch 3) and 3.0 (epoch 1)
    assert any("epoch001" in k for k in kept)
    assert any("epoch003" in k for k in kept)
    assert os.path.isdir(os.path.join(tmp_path, "last"))
