"""Lightning-parity trainer knobs: accumulate_grad_batches (K sequential
micro-batches inside the jitted step, ONE update on the mean gradient) and
gradient_clip_val (global-norm clip before the optimizer) — the reference
gets both through pl.Trainer.add_argparse_args
(centernet_detection.py:282)."""

import numpy as np
import jax
import jax.numpy as jnp

from centernet_tpu import CenterNetDetection
from centernet_tpu.parallel.mesh import make_mesh
from centernet_tpu.parallel.trainer import (
    TrainState,
    Trainer,
    make_train_step,
)

SIZE = 64
B = 4


def _task_and_batch():
    task = CenterNetDetection("res_18", learning_rate=1e-3)
    variables = task.init_variables(jax.random.PRNGKey(0), (SIZE, SIZE))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(B, SIZE, SIZE, 3), jnp.float32)
    n = 128
    boxes = np.zeros((B, n, 4), np.float32)
    boxes[:, :2] = rng.uniform(5, 40, (B, 2, 4))
    target = {
        "boxes": jnp.asarray(boxes),
        "classes": jnp.zeros((B, n), jnp.int32),
        "keypoints_raw": jnp.zeros((B, n, 17, 3), jnp.float32),
        "valid": jnp.asarray((np.arange(n) < 2)[None].repeat(B, 0)),
    }
    return task, variables, (imgs, target)


def test_grad_accum_matches_mean_of_micro_grads():
    """K=2 accumulation applies exactly the MEAN of the two micro-batch
    gradients (each computed with the batch_stats the scan carries)."""
    import optax

    task, variables, (imgs, target) = _task_and_batch()
    tx = optax.sgd(1.0)  # update == -grad: params delta exposes the grads
    state = TrainState.create(variables, tx)

    step_acc = jax.jit(make_train_step(task, tx, accumulate_grad_batches=2))
    new_state, _ = step_acc(state, (imgs, target))
    applied = jax.tree_util.tree_map(
        lambda new, old: old - new, new_state.params, state.params
    )

    # manual: micro-batch 0 with initial stats, micro-batch 1 with the
    # stats mutated by micro-batch 0, mean the grads. Micro j = rows
    # j::K (the strided assignment the step uses for sharding alignment).
    def grads_on(bs, j):
        def loss_fn(params):
            outs, mut = task.model.apply(
                {"params": params, "batch_stats": bs},
                imgs[j::2],
                True,
                mutable=["batch_stats"],
            )
            t = jax.tree_util.tree_map(lambda x: x[j::2], target)
            t = task.maybe_encode_targets((SIZE, SIZE), t)
            loss, _ = task.loss(outs, t)
            return loss, mut["batch_stats"]

        return jax.grad(loss_fn, has_aux=True)(state.params)

    g0, bs1 = jax.jit(grads_on, static_argnums=(1,))(state.batch_stats, 0)
    g1, _ = jax.jit(grads_on, static_argnums=(1,))(bs1, 1)
    want = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g0, g1)

    # Criterion: relative L2 error per leaf. The scan body and the
    # hand-rolled micro-steps compile to different fusions, and this
    # backend runs f32 contractions through bf16 passes (~3e-3 relative —
    # BENCHMARKS.md numerics note); the focal loss then amplifies that
    # rounding pointwise on a handful of elements (0.004% observed), so an
    # elementwise assert is the wrong tool — a semantic error (e.g. sum
    # instead of mean, stale batch_stats) moves the WHOLE leaf by O(1).
    flat_a = jax.tree_util.tree_leaves(applied)
    flat_w = jax.tree_util.tree_leaves(want)
    assert len(flat_a) == len(flat_w)
    for a, w in zip(flat_a, flat_w):
        a = np.asarray(a, np.float64)
        w = np.asarray(w, np.float64)
        denom = max(np.linalg.norm(w), 1e-9)
        rel = np.linalg.norm(a - w) / denom
        # 2.5e-2: rounding on small bias leaves reaches ~1e-2; a semantic
        # error (sum instead of mean, stale stats) is >= 0.3 on every leaf
        assert rel < 2.5e-2, (a.shape, rel)


def test_gradient_clip_val_limits_update(monkeypatch):
    """With clip=c the SGD update's global norm is exactly min(c, |g|);
    without it, the raw grad norm (far larger). SGD instead of the task's
    Adam because Adam's per-param normalization hides the clip — the test
    targets the Trainer's optax.chain wiring, not the optimizer."""
    import optax

    task, variables, batch = _task_and_batch()
    monkeypatch.setattr(
        type(task), "configure_optimizer", lambda self, spe: optax.sgd(1.0)
    )

    def step_norm(clip):
        tr = Trainer(
            task, mesh=make_mesh(n_data=1), gradient_clip_val=clip
        )
        state = TrainState.create(variables, tr.tx)
        step = jax.jit(make_train_step(task, tr.tx))
        new_state, stats = step(state, batch)
        assert np.isfinite(float(stats["loss"]))
        deltas = jax.tree_util.tree_map(
            lambda new, old: np.asarray(new - old, np.float64),
            new_state.params,
            state.params,
        )
        return np.sqrt(
            sum(
                float(np.sum(d * d))
                for d in jax.tree_util.tree_leaves(deltas)
            )
        )

    clipped = step_norm(1e-3)
    free = step_norm(None)
    assert clipped < free / 5, (clipped, free)


def test_clip_setting_keeps_opt_state_structure():
    """Toggling gradient_clip_val must not change the opt_state pytree —
    otherwise a checkpoint saved without clipping cannot resume with it
    (and vice versa)."""
    task, variables, _ = _task_and_batch()
    tr_off = Trainer(task, mesh=make_mesh(n_data=1))
    tr_on = Trainer(task, mesh=make_mesh(n_data=1), gradient_clip_val=35.0)
    s_off = TrainState.create(variables, tr_off.tx)
    s_on = TrainState.create(variables, tr_on.tx)
    assert jax.tree_util.tree_structure(
        s_off.opt_state
    ) == jax.tree_util.tree_structure(s_on.opt_state)
