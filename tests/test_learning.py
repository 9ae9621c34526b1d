"""Learning-dynamics sanity: overfitting one fixed batch must collapse the
loss — exercises encoder -> model -> loss -> grad -> optimizer end to end.
(On real TPU, res_18 drops 80 -> 1.4 in 150 steps; here a shorter CPU run
just checks a strong monotone decrease.)"""

import numpy as np

from centernet_tpu import CenterNetDetection
from centernet_tpu.data.sample import encode_detection
from centernet_tpu.parallel.mesh import make_mesh
from centernet_tpu.parallel.trainer import Trainer

SIZE = 64


def test_overfit_single_batch():
    task = CenterNetDetection("res_18", learning_rate=1e-3)
    trainer = Trainer(task, mesh=make_mesh(n_data=8))
    trainer.init_state(input_hw=(SIZE, SIZE))
    trainer._compile_steps()

    B = 8
    rng = np.random.RandomState(0)
    img = rng.rand(B, SIZE, SIZE, 3).astype(np.float32)
    boxes = np.zeros((B, 128, 4), np.float32)
    boxes[:, :2, :2] = rng.rand(B, 2, 2) * 40
    boxes[:, :2, 2:] = 16
    classes = np.zeros((B, 128), np.int32)
    valid = np.zeros((B, 128), bool)
    valid[:, :2] = True
    enc = [
        dict(encode_detection(boxes[i], classes[i], valid[i], (SIZE, SIZE), 80))
        for i in range(B)
    ]
    tgt = {k: np.stack([np.asarray(e[k]) for e in enc]) for k in enc[0]}
    batch = trainer._put_batch((img, tgt))

    state = trainer.state
    state, stats = trainer._train_step(state, batch)
    first = float(stats["loss"])
    for _ in range(30):
        state, stats = trainer._train_step(state, batch)
    last = float(stats["loss"])

    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.35, (first, last)
