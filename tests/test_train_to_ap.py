"""Train->AP regression gate (the only offline proxy for the COCO-mAP
accuracy north star): overfit ``resdcn_18`` on a tiny fixed dataset with a
REAL visual signal (painted rectangles), then run the full
decode->COCO-format->COCOeval chain and assert AP beats both an absolute
floor and the untrained model by a wide margin.

This certifies encode -> train (through the banded DCN) -> decode -> eval
end to end; the reference's own chain is trainer.fit -> COCOeval
(reference tests/test_train_detection.py:10-47 +
centernet_detection.py:252-265). Building this gate found two real issues
loss-only tests could not see (round 3): the train/eval DCN impl semantics
divergence (now clamped once at the module level, ops/dcn.py) and the
small-map offset-exile pathology (BENCHMARKS.md round-3 findings).

Design notes, calibrated on the 1-core CI box:
* DCN radius 1 via env: at 64^2 input the resdcn DCN maps are 2/4/8 cells;
  with the default radius 4 the model can learn to push every tap out of
  bounds (DCN output collapses to its bias -> input-independent features,
  heatmap loss plateaus at ~0.71). radius 1 keeps taps in-image and the
  run converges (hm_loss 0.004 by step 150, measured).
* AP is evaluated through the batched fixed-size path (no TTA padding):
  an overfit toy memorizes absolute positions, and the (d|31)+1 TTA pad
  shifts the stride-32 grid by half a cell, which legitimately breaks a
  memorizing model (measured: 0.86 AP unpadded vs ~0 padded on the same
  weights). Real models are translation-robust; the TTA path is covered
  by test_train_detection.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from centernet_tpu import CenterNetDetection
from centernet_tpu.data.sample import encode_detection
from centernet_tpu.parallel.mesh import make_mesh
from centernet_tpu.parallel.trainer import Trainer
from centernet_tpu.utils.coco_eval import CocoEvaluator

SIZE = 64
B = 8
N_BOXES = 2
# Convergence-time budget, not a fixed trajectory pin: the early loss
# trajectory on this 8-image toy is chaotic w.r.t. sub-1e-6 gradient
# perturbations (same seed, same code: hm_loss@150 measured 0.05 on the
# 8-core CPU mesh vs 0.60 on TPU under the autodiff backward, and 0.21
# under the bit-parity-gated hand VJP). Every healthy configuration
# reaches hm < 0.05 well before 400 (autodiff ~150, hand VJP ~250,
# measured); the known pathologies this gate exists to catch (DCN
# semantics divergence, offset exile) plateau at hm ~0.7 forever.
MAX_STEPS = 400
HM_CONVERGED = 0.05


def _make_dataset(rng, size=SIZE, box_lo=14, box_hi=26):
    """B fixed images with bright painted rectangles on dark noise — a
    learnable localization signal, not pure memorization."""
    imgs = rng.rand(B, size, size, 3).astype(np.float32) * 0.15
    # COCO xywh in input coords — the convention encode_detection and
    # PaddedAnnotationSample use (data/sample.py:53-66)
    boxes = np.zeros((B, 128, 4), np.float32)
    classes = np.zeros((B, 128), np.int32)
    valid = np.zeros((B, 128), bool)
    for i in range(B):
        for k in range(N_BOXES):
            w, h = rng.randint(box_lo, box_hi, 2)
            x = rng.randint(2, size - w - 2)
            y = rng.randint(2, size - h - 2)
            imgs[i, y : y + h, x : x + w] = 0.85 + 0.1 * rng.rand(h, w, 3)
            boxes[i, k] = [x, y, w, h]
            valid[i, k] = True
    return imgs, boxes, classes, valid


def _gt_dict(boxes, valid, size=SIZE):
    images = [{"id": i, "width": size, "height": size} for i in range(B)]
    anns = []
    aid = 1
    for i in range(B):
        for k in range(128):
            if not valid[i, k]:
                continue
            x, y, w, h = boxes[i, k]
            anns.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": 1,
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "area": float(w * h),
                    "iscrowd": 0,
                }
            )
            aid += 1
    return {
        "images": images,
        "annotations": anns,
        "categories": [{"id": 1, "name": "person"}],
    }


def _ap_fixed(task, variables, imgs, evaluator, size=SIZE):
    """AP through the batched fixed-size serving path (no TTA pad)."""
    ims, metas = [], []
    for i in range(B):
        im, meta = task.prepare_image_fixed(imgs[i], size)
        ims.append(im)
        metas.append(meta)
    dets = task.predict_batch(variables, jnp.stack(ims), metas)
    results = []
    for i, d in enumerate(dets):
        results.extend(task.to_coco_format(i, d))
    return evaluator(results)["ap"]


def test_train_improves_ap(monkeypatch):
    monkeypatch.setenv("CENTERNET_TPU_DCN_RADIUS", "1")  # see module doc
    rng = np.random.RandomState(7)
    imgs, boxes, classes, valid = _make_dataset(rng)
    evaluator = CocoEvaluator(_gt_dict(boxes, valid), "bbox")

    task = CenterNetDetection(
        "resdcn_18", learning_rate=2e-3, test_scales=[1.0], test_flip=False
    )
    trainer = Trainer(task, mesh=make_mesh(n_data=1))
    trainer.init_state(input_hw=(SIZE, SIZE))
    trainer._compile_steps()

    ap_untrained = _ap_fixed(task, trainer.state.variables(), imgs, evaluator)

    # one fixed batch, host-side encode (equality-gated vs on-device path)
    norm = (imgs - np.array(task.mean, np.float32)) / np.array(
        task.std, np.float32
    )
    enc = [
        dict(
            encode_detection(boxes[i], classes[i], valid[i], (SIZE, SIZE), 80)
        )
        for i in range(B)
    ]
    tgt = {k: np.stack([np.asarray(e[k]) for e in enc]) for k in enc[0]}
    batch = trainer._put_batch((norm, tgt))

    state = trainer.state
    hm = float("inf")
    for s in range(MAX_STEPS):
        state, stats = trainer._train_step(state, batch)
        # fetch a scalar every few steps: hundreds of unsynced dispatches
        # exhaust the single-core CPU runtime's queue and abort the process
        if (s + 1) % 25 == 0:
            assert np.isfinite(float(stats["loss"]))
            hm = float(stats["hm_loss"])
            if hm < HM_CONVERGED:
                break

    assert hm < HM_CONVERGED, dict(
        (k, float(v)) for k, v in stats.items()
    )

    ap_trained = _ap_fixed(task, state.variables(), imgs, evaluator)

    # Untrained heatmaps are sigmoid(-2.19)~0.1 noise: AP ~ 0. Trained hits
    # ~0.86 (measured); gate with wide margins against flakiness.
    assert ap_trained >= 0.5, (ap_untrained, ap_trained)
    assert ap_trained >= ap_untrained + 0.4, (ap_untrained, ap_trained)


@pytest.mark.slow
def test_train_improves_ap_production_radius():
    """Flagship-semantics AP gate (VERDICT r3 weak #5): NO radius
    monkeypatch — the production per-scale clamp default (r=4 coarse /
    r=2 fine, ops/dcn.py) is exactly what runs. 128^2 input keeps the
    smallest resdcn DCN map at 4 cells, where the r=4 clamp is active but
    not degenerate (the 64^2 gate above needs r=1 because its stride-32
    map is 2 cells).

    Thresholds calibrated on the CI box (CPU, f32, seed 11, this exact
    setup, 2026-08): AP trajectory 0.35 @ step 100 -> 0.76 @ 150 ->
    0.99 @ 200 -> saturated ~0.97-1.0 through 600; hm_loss 0.0101 @ 200.
    200 steps sits past the steep rise under the autodiff backward;
    budgeted to 2x that with convergence early-exit (see MAX_STEPS note:
    the early trajectory is chaotic across backends/backwards)
    (~2.2 s/step on the 1-core box)."""
    steps = 400
    size = 128
    rng = np.random.RandomState(11)
    imgs, boxes, classes, valid = _make_dataset(rng, size=size, box_lo=20,
                                                box_hi=44)
    evaluator = CocoEvaluator(_gt_dict(boxes, valid, size=size), "bbox")

    task = CenterNetDetection(
        "resdcn_18", learning_rate=2e-3, test_scales=[1.0], test_flip=False
    )
    trainer = Trainer(task, mesh=make_mesh(n_data=1))
    trainer.init_state(input_hw=(size, size))
    trainer._compile_steps()

    ap_untrained = _ap_fixed(task, trainer.state.variables(), imgs,
                             evaluator, size=size)

    norm = (imgs - np.array(task.mean, np.float32)) / np.array(
        task.std, np.float32
    )
    enc = [
        dict(
            encode_detection(boxes[i], classes[i], valid[i], (size, size), 80)
        )
        for i in range(B)
    ]
    tgt = {k: np.stack([np.asarray(e[k]) for e in enc]) for k in enc[0]}
    batch = trainer._put_batch((norm, tgt))

    state = trainer.state
    hm = float("inf")
    for s in range(steps):
        state, stats = trainer._train_step(state, batch)
        if (s + 1) % 25 == 0:
            assert np.isfinite(float(stats["loss"]))
            hm = float(stats["hm_loss"])
            if hm < HM_CONVERGED:
                break

    assert hm < HM_CONVERGED, dict(
        (k, float(v)) for k, v in stats.items()
    )

    ap_trained = _ap_fixed(task, state.variables(), imgs, evaluator,
                           size=size)
    assert ap_trained >= 0.5, (ap_untrained, ap_trained)
    assert ap_trained >= ap_untrained + 0.4, (ap_untrained, ap_trained)
