"""Detection train + TTA test smoke (mirrors reference
tests/test_train_detection.py:10-47): a few optimizer steps on the fake
dataset over the 8-device CPU mesh, then full flip+multi-scale TTA
prediction — exercises DCN, losses, decode and soft-NMS end to end.

Uses ``resdcn_18`` rather than the reference's dla_34 to keep CPU compile
times CI-friendly while still covering the DCN op; dla_34 is covered by the
model shape tests and the multi-pose smoke."""

import numpy as np
import jax

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
from centernet_tpu.parallel.trainer import Trainer

from tests.utilities import CocoFakeDataset

SIZE = 128


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


def test_train_and_tta_detection():
    task = CenterNetDetection(
        "resdcn_18",
        learning_rate=1e-4,
        test_scales=[0.75, 1.0],
        test_flip=True,
    )

    dataset = CocoFakeDataset(transforms=_pipeline(), length=8, size=SIZE)
    loader = DataLoader(dataset, batch_size=8, num_workers=2, shuffle=True)

    mesh = make_mesh()  # 8 virtual CPU devices
    assert mesh.devices.size == 8

    trainer = Trainer(
        task, mesh=mesh, max_epochs=1, limit_train_batches=2, limit_val_batches=1
    )
    trainer.init_state(input_hw=(SIZE, SIZE))
    state = trainer.fit(loader, loader)
    assert int(state.step) >= 1
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # TTA predict path: flip + multi-scale + soft-NMS + top-k.
    img = np.random.rand(SIZE, SIZE, 3).astype(np.float32)
    results = task.predict(state.variables(), img)
    assert set(results.keys()) == set(range(1, 81))
    # >= threshold keeps score ties (reference semantics), so an untrained
    # model can retain more than test_max_per_image — bounded by K * scales.
    total = sum(v.shape[0] for v in results.values())
    assert 0 < total <= task.decode_k * len(task.test_scales)
    for v in results.values():
        assert v.shape[1] == 5

    coco = task.to_coco_format(42, results)
    if coco:
        assert coco[0]["image_id"] == 42
        assert "bbox" in coco[0] and "score" in coco[0]
