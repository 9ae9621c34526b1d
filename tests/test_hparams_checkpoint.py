"""Self-describing checkpoints (Lightning ``save_hyperparameters``
equivalent, reference centernet_detection.py:86 + centernet_test.py:72-74):
the trainer's checkpoint sidecar persists the task hparams, and eval can
reconstruct the exact task from the checkpoint alone — no ``--arch`` flag.
"""

import json

import jax
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
from centernet_tpu.tasks import task_from_hparams
from centernet_tpu.tasks.multi_pose import CenterNetMultiPose
from centernet_tpu.utils.checkpoint import (
    load_checkpoint_hparams,
    restore_checkpoint,
)

from tests.utilities import CocoFakeDataset

SIZE = 64


def test_task_hparams_roundtrip():
    """hparams() -> task_from_hparams reconstructs the identical model config
    for both tasks (dla_34 covers the non-default head_conv/num_stacks path),
    and the dict is JSON-serializable (it rides a .json sidecar)."""
    for task in (
        CenterNetDetection("dla_34", learning_rate=1e-3,
                           learning_rate_milestones=[3, 5], wh_weight=0.2),
        CenterNetMultiPose("dla_34", hp_weight=0.5, num_joints=17),
    ):
        hp = json.loads(json.dumps(task.hparams()))
        rebuilt = task_from_hparams(hp)
        assert type(rebuilt) is type(task)
        assert rebuilt.arch == task.arch == "dla_34"
        assert dict(rebuilt.heads) == dict(task.heads)
        assert rebuilt.head_conv == task.head_conv == 256
        assert rebuilt.learning_rate == task.learning_rate
        assert rebuilt.learning_rate_milestones == task.learning_rate_milestones


def test_checkpoint_self_describing(tmp_path):
    """Fit saves hparams into the sidecar; a fresh process can rebuild the
    task purely from the checkpoint (arch res_18 here deliberately differs
    from the CLI default dla_34 — reconstruction must NOT depend on any
    flag) and restore weights into it."""
    pipeline = ComposeSample(
        [
            ImageAugmentation(
                Identity(),
                Normalize(CenterNetDetection.mean, CenterNetDetection.std),
            ),
            CategoryIdToClass(CenterNetDetection.valid_ids),
            CenterDetectionSample(),
        ]
    )
    dataset = CocoFakeDataset(transforms=pipeline, length=8, size=SIZE)
    loader = DataLoader(dataset, batch_size=8, num_workers=0, shuffle=False)

    task = CenterNetDetection("res_18", learning_rate=1e-4)
    cb = CheckpointCallback(
        dirpath=str(tmp_path / "ckpts"), save_top_k=1, every_n_epochs=1
    )
    trainer = Trainer(
        task, mesh=make_mesh(), max_epochs=1, limit_train_batches=1,
        checkpoint=cb,
    )
    trainer.init_state(input_hw=(SIZE, SIZE))
    trainer.fit(loader)

    last = str(tmp_path / "ckpts" / "last")
    hp = load_checkpoint_hparams(last)
    assert hp is not None and hp["arch"] == "res_18"
    assert hp["task"] == "CenterNetDetection"

    # Reconstruct WITHOUT naming the arch anywhere, then eval.
    task2 = task_from_hparams(hp, test_scales=[1.0], test_flip=False)
    trainer2 = Trainer(task2, mesh=make_mesh())
    trainer2.init_state(input_hw=(SIZE, SIZE))
    trainer2.state = restore_checkpoint(last, trainer2.state)

    a = np.asarray(
        next(iter(jax.tree_util.tree_leaves(trainer.state.params)))
    )
    b = np.asarray(
        next(iter(jax.tree_util.tree_leaves(trainer2.state.params)))
    )
    np.testing.assert_array_equal(a, b)

    img = np.random.rand(SIZE, SIZE, 3).astype(np.float32)
    results = task2.predict(trainer2.state.variables(), img)
    assert set(results.keys()) == set(range(1, 81))
