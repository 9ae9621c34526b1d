"""Batched fixed-shape eval path: same detections as the per-image path for
same-geometry inputs, and end-to-end through the COCO evaluator."""

import numpy as np

from centernet_tpu import CenterNetDetection
from centernet_tpu.parallel.mesh import make_mesh
from centernet_tpu.parallel.trainer import Trainer
from centernet_tpu.utils.coco_eval import CocoEvaluator

SIZE = 128


def test_batched_eval_runs_and_matches_per_image():
    task = CenterNetDetection("res_18", test_scales=[1.0], test_flip=False)
    trainer = Trainer(task, mesh=make_mesh(n_data=1))
    trainer.init_state(input_hw=(SIZE, SIZE))

    rng = np.random.RandomState(0)
    imgs = [rng.rand(96, SIZE, 3).astype(np.float32) for _ in range(5)]

    # batched path
    results = []
    import jax.numpy as jnp

    prepared = [task.prepare_image_fixed(im, SIZE) for im in imgs]
    batch = jnp.stack([p[0] for p in prepared])
    metas = [p[1] for p in prepared]
    dets_batched = task.predict_batch(trainer.state.variables(), batch, metas)

    # per-image path on the SAME pre-resized geometry: run predict_batch per
    # image and compare
    for i, im in enumerate(imgs):
        one = task.predict_batch(
            trainer.state.variables(), batch[i : i + 1], [metas[i]]
        )[0]
        for cls in one:
            np.testing.assert_allclose(
                one[cls], dets_batched[i][cls], rtol=1e-4, atol=1e-4
            )

    # end-to-end through trainer.test_batched with a tiny GT + evaluator
    gt = {
        "images": [{"id": i, "width": SIZE, "height": 96} for i in range(5)],
        "annotations": [
            {
                "id": i + 1,
                "image_id": i,
                "category_id": 1,
                "bbox": [10.0, 10.0, 30.0, 30.0],
                "area": 900.0,
                "iscrowd": 0,
            }
            for i in range(5)
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    stats = trainer.test_batched(
        ((im, i) for i, im in enumerate(imgs)),
        CocoEvaluator(gt, "bbox"),
        batch_size=2,
        input_size=SIZE,
    )
    assert "test/ap" in stats
    assert np.isfinite(stats["test/ap"])
