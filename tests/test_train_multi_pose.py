"""Multi-pose train + TTA smoke (mirrors reference
tests/test_train_multi_pose.py:14-51) on dla_34 — exercises the DLA+DCN
backbone, all six pose losses, keypoint decode snapping and soft_nms_39."""

import numpy as np

from centernet_tpu import CenterNetMultiPose
from centernet_tpu.data import (
    CenterDetectionSample,
    ComposeSample,
    ImageAugmentation,
    Identity,
    MultiPoseSample,
    MultiSampleTransform,
    Normalize,
    PoseFlip,
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
                Normalize(CenterNetMultiPose.mean, CenterNetMultiPose.std),
            ),
            PoseFlip(0.5),
            MultiSampleTransform(
                [CenterDetectionSample(num_classes=1), MultiPoseSample()]
            ),
        ]
    )


def test_train_and_tta_multi_pose():
    task = CenterNetMultiPose(
        "dla_34",
        learning_rate=1e-4,
        # single-scale + flip: the multi-scale soft-NMS merge is exercised
        # by the detection TTA smoke and the soft_nms_39 oracle tests; a
        # second dla_34 predict graph costs ~90 s of CPU compile here.
        test_scales=[1.0],
        test_flip=True,
    )

    dataset = CocoFakeDataset(transforms=_pipeline(), length=8, size=SIZE)
    loader = DataLoader(dataset, batch_size=8, num_workers=2, shuffle=True)

    trainer = Trainer(
        task,
        mesh=make_mesh(),
        max_epochs=1,
        limit_train_batches=2,
        limit_val_batches=1,
    )
    trainer.init_state(input_hw=(SIZE, SIZE))
    state = trainer.fit(loader, loader)
    assert int(state.step) >= 1

    img = np.random.rand(SIZE, SIZE, 3).astype(np.float32)
    results = task.predict(state.variables(), img)
    assert results.ndim == 2 and results.shape[1] == 57
    assert results.shape[0] > 0

    coco = task.to_coco_format(7, results)
    assert coco[0]["category_id"] == 1
    assert len(coco[0]["keypoints"]) == 51
