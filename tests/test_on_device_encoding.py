"""On-device target encoding (PaddedAnnotationSample + task.encode_targets):
must produce targets identical to the host-side encoders, and the trainer
must train from raw padded annotations end to end."""

import numpy as np
import jax
import jax.numpy as jnp

from centernet_tpu import CenterNetDetection
from centernet_tpu.data import (
    CategoryIdToClass,
    CenterDetectionSample,
    ComposeSample,
    ImageAugmentation,
    Identity,
    MultiPoseSample,
    MultiSampleTransform,
    Normalize,
    PaddedAnnotationSample,
)
from centernet_tpu.data.loader import DataLoader
from centernet_tpu.parallel.mesh import make_mesh
from centernet_tpu.parallel.trainer import Trainer
from centernet_tpu.tasks.multi_pose import CenterNetMultiPose

from tests.utilities import CocoFakeDataset

SIZE = 64


def _batch(pipeline, n=4, size=SIZE):
    ds = CocoFakeDataset(transforms=pipeline, length=n, size=size)
    loader = DataLoader(ds, batch_size=n, num_workers=0, shuffle=False)
    return next(iter(loader))


def test_detection_on_device_encoding_matches_host():
    task = CenterNetDetection("res_18")
    head = [
        ImageAugmentation(Identity(), Normalize(task.mean, task.std)),
        CategoryIdToClass(task.valid_ids),
    ]
    imgs_h, host_t = _batch(ComposeSample(head + [CenterDetectionSample()]))
    imgs_r, raw_t = _batch(ComposeSample(head + [PaddedAnnotationSample()]))
    np.testing.assert_array_equal(imgs_h, imgs_r)

    enc = jax.jit(
        lambda t: task.maybe_encode_targets((SIZE, SIZE), t)
    )({k: jnp.asarray(v) for k, v in raw_t.items()})
    assert set(enc.keys()) == set(host_t.keys())
    for k in host_t:
        np.testing.assert_allclose(
            np.asarray(enc[k]), np.asarray(host_t[k]), rtol=0, atol=0,
            err_msg=k,
        )


def test_multi_pose_on_device_encoding_matches_host():
    task = CenterNetMultiPose("res_18")
    head = [ImageAugmentation(Identity(), Normalize(task.mean, task.std))]
    host_pipe = ComposeSample(
        head
        + [MultiSampleTransform([CenterDetectionSample(num_classes=1),
                                 MultiPoseSample()])]
    )
    raw_pipe = ComposeSample(head + [PaddedAnnotationSample()])
    imgs_h, host_t = _batch(host_pipe)
    imgs_r, raw_t = _batch(raw_pipe)
    np.testing.assert_array_equal(imgs_h, imgs_r)

    enc = jax.jit(
        lambda t: task.maybe_encode_targets((SIZE, SIZE), t)
    )({k: jnp.asarray(v) for k, v in raw_t.items()})
    assert set(enc.keys()) == set(host_t.keys())
    for k in sorted(host_t):
        np.testing.assert_allclose(
            np.asarray(enc[k]), np.asarray(host_t[k]), rtol=0, atol=0,
            err_msg=k,
        )


def test_train_step_from_raw_annotations():
    task = CenterNetDetection("res_18", learning_rate=1e-4)
    pipe = ComposeSample(
        [
            ImageAugmentation(Identity(), Normalize(task.mean, task.std)),
            CategoryIdToClass(task.valid_ids),
            PaddedAnnotationSample(),
        ]
    )
    ds = CocoFakeDataset(transforms=pipe, length=8, size=SIZE)
    loader = DataLoader(ds, batch_size=8, num_workers=0, shuffle=False)
    trainer = Trainer(task, mesh=make_mesh(), max_epochs=1,
                      limit_train_batches=1)
    trainer.init_state(input_hw=(SIZE, SIZE))
    state = trainer.fit(loader)
    assert int(state.step) == 1
