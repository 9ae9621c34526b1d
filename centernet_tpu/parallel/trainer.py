"""Trainer: jitted data-parallel train/eval steps + fit loop.

TPU-native replacement for the reference's ``pl.Trainer`` usage
(reference: centernet_detection.py:393-415): one ``jax.jit``-compiled train
step closed over a device mesh (params replicated, batch sharded over the
``data`` axis; XLA emits the ICI psum for gradients), epoch loop with
validation, Lightning-style checkpointing (top-k on val_loss + save_last +
every-n-epochs via orbax), metric logging, and LR monitoring.

``sync_dist=True`` logging in the reference (centernet.py:87-90) is the
cross-replica mean of metrics — here that falls out of jit's global-view
semantics: losses are computed over the global (sharded) batch.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Iterable, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core, struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..utils.logging import MetricsLogger
from .mesh import batch_sharding, make_mesh, replicated_sharding


class TrainState(struct.PyTreeNode):
    """Parameters + BN statistics + optimizer state."""

    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        batch_stats = variables.get("batch_stats", core.FrozenDict())
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
        )

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def _with_global_norm_clip(tx, max_norm: float):
    """Clip the global grad norm before ``tx`` WITHOUT changing the
    opt_state pytree (unlike ``optax.chain``, which adds a tuple level):
    checkpoints stay restorable across toggling the clip setting."""
    clip = optax.clip_by_global_norm(max_norm)

    def update(grads, state, params=None):
        grads, _ = clip.update(grads, optax.EmptyState(), params)
        return tx.update(grads, state, params)

    return optax.GradientTransformation(tx.init, update)


def make_train_step(task, tx, accumulate_grad_batches: int = 1) -> Callable:
    """Build the pure train step: (state, batch) -> (state, metrics).

    ``accumulate_grad_batches`` = K > 1 splits the batch's leading axis
    into K sequential micro-batches inside the jitted step (``lax.scan``),
    averages their grads, and applies ONE optimizer update (BN statistics
    advance per micro-batch, the update sees the mean gradient).

    NOTE the parameterization difference vs Lightning: Lightning
    accumulates K LOADER batches per update (effective batch = K *
    batch_size); here the LOADER batch is the effective batch and K only
    controls how it is micro-batched through memory. To reproduce a
    Lightning config (batch_size=B, accumulate_grad_batches=K), set
    batch_size = K*B with accumulate_grad_batches = K — the resulting
    computation (K sequential micro-batches of B, one update on the mean
    gradient, per-micro-batch BN) is identical.

    The batch leading dim must divide by K; under a data-sharded mesh,
    the PER-DEVICE rows must divide by K so each micro-batch keeps the
    same sharding."""

    def grads_of(params, batch_stats, img, target):
        img = task.prep_images(img)  # uint8 loader batches normalize on device

        def loss_fn(params):
            outputs, mutated = task.model.apply(
                {"params": params, "batch_stats": batch_stats},
                img,
                True,
                mutable=["batch_stats"],
            )
            loss, stats = task.loss(outputs, target)
            return loss, (stats, mutated["batch_stats"])

        return jax.grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, batch):
        img, target = batch
        # raw padded annotations are encoded on device (vectorized splats)
        target = task.maybe_encode_targets(img.shape[1:3], target)

        if accumulate_grad_batches > 1:
            k = accumulate_grad_batches
            if img.shape[0] % k:
                raise ValueError(
                    f"batch size {img.shape[0]} must divide by "
                    f"accumulate_grad_batches={k} (and per-device rows "
                    f"must divide by it to keep the data sharding)"
                )

            def split(x):
                # STRIDED assignment (micro j = rows j, j+K, ...): under a
                # data-sharded batch every device contributes rows to every
                # micro-batch, so each scan step keeps the same sharding
                # with no cross-device resharding. A contiguous K-chunk
                # split would put micro 0 entirely on the first devices and
                # force an all-to-all per micro step. Row->micro assignment
                # is semantically arbitrary (the batch is unordered).
                y = x.reshape((x.shape[0] // k, k) + x.shape[1:])
                return jnp.moveaxis(y, 1, 0)

            micro = jax.tree_util.tree_map(split, (img, target))

            def body(carry_bs, mb):
                mi, mt = mb
                grads, (stats, new_bs) = grads_of(
                    state.params, carry_bs, mi, mt
                )
                return new_bs, (grads, stats)

            new_batch_stats, (gstack, sstack) = jax.lax.scan(
                body, state.batch_stats, micro
            )
            grads = jax.tree_util.tree_map(
                lambda g: jnp.mean(g, axis=0), gstack
            )
            stats = jax.tree_util.tree_map(
                lambda s: jnp.mean(s, axis=0), sstack
            )
        else:
            grads, (stats, new_batch_stats) = grads_of(
                state.params, state.batch_stats, img, target
            )

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        return new_state, stats

    return train_step


def make_eval_step(task) -> Callable:
    def eval_step(state: TrainState, batch):
        img, target = batch
        target = task.maybe_encode_targets(img.shape[1:3], target)
        outputs = task.model.apply(state.variables(), task.prep_images(img), False)
        _, stats = task.loss(outputs, target)
        return stats

    return eval_step


@dataclasses.dataclass
class CheckpointCallback:
    """Lightning-style ModelCheckpoint semantics (reference
    centernet_detection.py:395-401): keep top-k by monitored metric,
    save_last, every_n_epochs cadence."""

    dirpath: str
    monitor: str = "val_loss"
    save_top_k: int = 5
    save_last: bool = True
    every_n_epochs: int = 10
    _best: List[Tuple[float, str]] = dataclasses.field(default_factory=list)

    def __post_init__(self):
        os.makedirs(self.dirpath, exist_ok=True)

    def on_epoch_end(self, epoch: int, metrics: Mapping[str, float], save_fn):
        if self.save_last:
            save_fn(os.path.join(self.dirpath, "last"))
        if self.every_n_epochs and (epoch + 1) % self.every_n_epochs != 0:
            return
        value = float(metrics.get(self.monitor, np.inf))
        path = os.path.join(
            self.dirpath, f"epoch{epoch:03d}-{self.monitor}{value:.4f}"
        )
        self._best.append((value, path))
        self._best.sort(key=lambda t: t[0])
        if len(self._best) <= self.save_top_k or path in [
            p for _, p in self._best[: self.save_top_k]
        ]:
            save_fn(path)
        # prune beyond top-k (orbax dir + its meta sidecar)
        for _, stale in self._best[self.save_top_k :]:
            if os.path.isdir(stale):
                import shutil

                shutil.rmtree(stale, ignore_errors=True)
            try:
                os.remove(stale + ".meta.json")
            except OSError:
                pass
        self._best = self._best[: self.save_top_k]


def _unpad_gathered_json(rows, lengths):
    """Pure merge step of the COCO-result allgather: decode each process's
    length-prefixed JSON payload row and concatenate (unit-tested without
    a multi-process runtime)."""
    import json

    merged = []
    for row, n in zip(rows, lengths):
        if int(n) == 0:
            continue
        data = np.asarray(row[: int(n)], np.uint8).tobytes()
        merged.extend(json.loads(data.decode("utf-8")))
    return merged


def _allgather_coco_results(coco_results):
    """Union variable-length COCO result dicts across processes — the
    Lightning-DDP eval-gather equivalent. Detections are host-side Python
    data of uneven length, so they ride jax collectives as one padded
    uint8 JSON payload per process (scalar length allgather first)."""
    import json

    from jax.experimental import multihost_utils as mhu

    payload = np.frombuffer(
        json.dumps(coco_results).encode("utf-8"), np.uint8
    )
    lengths = np.asarray(
        mhu.process_allgather(np.int64(payload.size))
    ).reshape(-1)
    cap = max(1, int(lengths.max()))
    padded = np.zeros(cap, np.uint8)
    padded[: payload.size] = payload
    rows = np.asarray(mhu.process_allgather(padded)).reshape(
        len(lengths), cap
    )
    return _unpad_gathered_json(rows, lengths)


class Trainer:
    """Data-parallel trainer over an ICI mesh."""

    def __init__(
        self,
        task,
        mesh=None,
        max_epochs: int = 1,
        limit_train_batches: Optional[int] = None,
        limit_val_batches: Optional[int] = None,
        log_dir: Optional[str] = None,
        checkpoint: Optional[CheckpointCallback] = None,
        steps_per_epoch_hint: int = 1,
        seed: int = 5318008,
        log_every_n_steps: int = 50,
        gradient_clip_val: Optional[float] = None,
        accumulate_grad_batches: int = 1,
    ):
        self.task = task
        self.mesh = mesh if mesh is not None else make_mesh()
        self.max_epochs = max_epochs
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.logger = MetricsLogger(log_dir)
        self.checkpoint = checkpoint
        self.seed = seed
        self.log_every_n_steps = max(1, log_every_n_steps)

        self.steps_per_epoch = max(1, steps_per_epoch_hint)
        self.tx = task.configure_optimizer(steps_per_epoch_hint)
        # Lightning-parity knobs the reference exposes through
        # pl.Trainer.add_argparse_args (centernet_detection.py:282):
        # gradient_clip_val clips the GLOBAL grad norm before the optimizer
        # (Lightning's default algorithm='norm'); accumulate_grad_batches
        # scans K micro-batches inside the jitted step and applies ONE
        # optimizer update on the averaged grads.
        # Clipping wraps tx.update but keeps the INNER opt_state as the
        # state (optax.chain would add a tuple level), so the pytree
        # structure is identical with or without the flag — checkpoints
        # restore across a clip-setting change and across this feature's
        # introduction (clip_by_global_norm is stateless anyway).
        if gradient_clip_val:
            self.tx = _with_global_norm_clip(
                self.tx, float(gradient_clip_val)
            )
        self.accumulate_grad_batches = max(1, int(accumulate_grad_batches))
        self._train_step = None
        self._eval_step = None
        self.state: Optional[TrainState] = None

    # -- setup ----------------------------------------------------------------

    def init_state(self, input_hw=(512, 512)) -> TrainState:
        variables = self.task.init_variables(
            jax.random.PRNGKey(self.seed), input_hw
        )
        state = TrainState.create(variables, self.tx)
        # Replicate state over the mesh.
        rep = replicated_sharding(self.mesh)
        self.state = jax.device_put(state, rep)
        return self.state

    def _compile_steps(self):
        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        if self._train_step is None:
            step = make_train_step(
                self.task, self.tx,
                accumulate_grad_batches=self.accumulate_grad_batches,
            )
            self._train_step = jax.jit(
                step,
                in_shardings=(rep, data),
                out_shardings=(rep, rep),
                donate_argnums=(0,),
            )
        if self._eval_step is None:
            estep = make_eval_step(self.task)
            self._eval_step = jax.jit(
                estep, in_shardings=(rep, data), out_shardings=rep
            )

    # -- loops ----------------------------------------------------------------

    def _put_batch(self, batch):
        sharding = batch_sharding(self.mesh)

        if jax.process_count() > 1:
            # Multi-controller: each host holds only its slice of the global
            # batch (DataLoader process-shards the index order); assemble the
            # global jax.Array from per-process shards. A plain device_put of
            # host-local data onto a global sharding is invalid here.
            def put(x):
                x = np.asarray(x)
                global_shape = (
                    x.shape[0] * jax.process_count(),
                ) + x.shape[1:]
                return jax.make_array_from_process_local_data(
                    sharding, x, global_shape
                )

        else:

            def put(x):
                return jax.device_put(jnp.asarray(x), sharding)

        img, target = batch
        return put(img), jax.tree_util.tree_map(put, target)

    def fit(
        self,
        train_loader: Iterable,
        val_loader: Optional[Iterable] = None,
        resume_from: Optional[str] = None,
    ):
        """Run the training loop.  ``resume_from`` restores a checkpoint saved
        by this trainer — step counter, optimizer state, and epoch position
        all continue (Lightning ``ckpt_path`` resume semantics)."""
        if self.state is None:
            self.init_state()
        start_epoch = 0
        if resume_from is not None:
            from ..utils.checkpoint import restore_checkpoint

            state, meta = restore_checkpoint(
                resume_from, self.state, with_meta=True
            )
            self.state = jax.device_put(state, replicated_sharding(self.mesh))
            if "epoch" in meta:
                start_epoch = int(meta["epoch"]) + 1
            else:
                # No sidecar (pre-meta checkpoint): derive the epoch from the
                # restored step counter rather than silently re-running every
                # epoch against an already-advanced step/LR schedule.
                start_epoch = int(state.step) // self.steps_per_epoch
        self._compile_steps()

        for epoch in range(start_epoch, self.max_epochs):
            t0 = time.time()
            n_images = 0
            for i, batch in enumerate(train_loader):
                if (
                    self.limit_train_batches is not None
                    and i >= self.limit_train_batches
                ):
                    break
                batch = self._put_batch(batch)
                n_images += batch[0].shape[0]
                self.state, stats = self._train_step(self.state, batch)
                # Fetching metrics synchronizes with the device (and pays
                # the full transfer round trip on remote runtimes) — only do
                # it on the logging cadence; other steps stay fully async.
                if (i + 1) % self.log_every_n_steps == 0 or (
                    self.limit_train_batches is not None
                    and i + 1 >= self.limit_train_batches
                ):
                    self.logger.log_step(
                        int(self.state.step),
                        {f"train/{k}": float(v) for k, v in stats.items()},
                    )
            train_time = time.time() - t0

            metrics: Dict[str, float] = {
                "epoch": epoch,
                "train_images_per_sec": n_images / max(train_time, 1e-9),
            }
            if val_loader is not None:
                agg: Dict[str, List[float]] = {}
                for i, batch in enumerate(val_loader):
                    if (
                        self.limit_val_batches is not None
                        and i >= self.limit_val_batches
                    ):
                        break
                    batch = self._put_batch(batch)
                    stats = self._eval_step(self.state, batch)
                    for k, v in stats.items():
                        agg.setdefault(k, []).append(float(v))
                for k, vs in agg.items():
                    name = "val_loss" if k == "loss" else f"val/{k}"
                    metrics[name] = float(np.mean(vs))

            # LR monitor (reference LearningRateMonitor, per epoch).
            metrics["learning_rate"] = self._current_lr()
            self.logger.log_epoch(epoch, metrics)

            if self.checkpoint is not None:
                from ..utils.checkpoint import save_checkpoint

                # hparams ride the sidecar so eval can reconstruct the task
                # from the checkpoint alone (Lightning save_hyperparameters,
                # reference centernet_detection.py:86).
                self.checkpoint.on_epoch_end(
                    epoch,
                    metrics,
                    lambda path: save_checkpoint(
                        path,
                        self.state,
                        meta={"epoch": epoch, "hparams": self.task.hparams()},
                    ),
                )
        return self.state

    def _current_lr(self) -> float:
        """Read the LR from the task's actual optax schedule (no drift)."""
        try:
            return float(self.task.lr_schedule(int(self.state.step)))
        except Exception:
            return float("nan")

    # -- eval / test -----------------------------------------------------------

    def _eval_variables(self):
        """Variables for the per-process eval path. Under multi-controller
        JAX prediction is NOT a lockstep SPMD computation (each process
        runs its own shard of the dataset, with its own shapes and call
        counts), so the globally-sharded state arrays cannot feed the
        per-process jits. Params are replicated over the mesh — every
        process holds a complete copy — so pull them to host once and let
        each process compute locally."""
        variables = self.state.variables()
        if jax.process_count() > 1:
            variables = jax.tree_util.tree_map(
                lambda x: np.asarray(x.addressable_data(0)), variables
            )
        return variables

    def _eval_shard(self, dataset, presharded: bool):
        """Strided per-process view of an eval dataset (Lightning-DDP
        eval-sampler equivalent). ``presharded=True`` means the caller
        already split the id list per process (cheaper — the stride here
        skips items only AFTER the generator decoded them)."""
        if presharded or jax.process_count() == 1:
            yield from dataset
            return
        for i, item in enumerate(dataset):
            if i % jax.process_count() == jax.process_index():
                yield item

    def test_batched(
        self,
        dataset,
        coco_eval=None,
        prefix: str = "",
        batch_size: int = 16,
        input_size: int = 512,
        presharded: bool = False,
        infer_fn=None,
    ) -> Dict[str, float]:
        """Batched single-scale evaluation (production serving path): all
        images share one fixed shape, one device round trip per batch —
        orders of magnitude less host<->device latency than the per-image
        reference-style TTA loop in ``test``. ``infer_fn`` overrides the
        forward+decode (e.g. spatially sharded over the ``model`` mesh
        axis, ``parallel.spatial.make_spatial_infer``)."""
        import jax.numpy as jnp

        variables = self._eval_variables()
        results = []
        buf_imgs, buf_metas, buf_ids = [], [], []

        def flush():
            if not buf_imgs:
                return
            images = jnp.stack(buf_imgs)
            dets = self.task.predict_batch(
                variables, images, buf_metas, infer_fn=infer_fn
            )
            results.extend(zip(buf_ids, dets))
            buf_imgs.clear()
            buf_metas.clear()
            buf_ids.clear()

        for img, image_id in self._eval_shard(dataset, presharded):
            im, meta = self.task.prepare_image_fixed(img, input_size)
            buf_imgs.append(im)
            buf_metas.append(meta)
            buf_ids.append(image_id)
            if len(buf_imgs) == batch_size:
                flush()
        flush()

        return self._evaluate_results(results, coco_eval, prefix)

    def test(
        self, dataset, coco_eval=None, prefix: str = "",
        presharded: bool = False,
    ) -> Dict[str, float]:
        """Run TTA prediction over a dataset of (img_hwc, image_id) and, when
        a COCO ground-truth evaluator is given, compute AP stats
        (reference trainer.test path, centernet_detection.py:227-265).

        Under multi-controller JAX each process predicts only its shard of
        the dataset (the Lightning-DDP eval-sharding equivalent; pass
        ``presharded=True`` if the caller already split the ids); the
        COCO-format detections are allgathered before scoring, so every
        process computes (identical) global stats."""
        variables = self._eval_variables()
        results = []
        for img, image_id in self._eval_shard(dataset, presharded):
            det = self.task.predict(variables, img)
            results.append((image_id, det))
        return self._evaluate_results(results, coco_eval, prefix)

    def _evaluate_results(self, results, coco_eval, prefix) -> Dict[str, float]:
        """Score accumulated (image_id, detections) against COCO ground truth.

        ``coco_eval`` is either a single evaluator (scored under ``prefix``)
        or a list of ``(prefix, evaluator)`` pairs so one prediction pass can
        feed several COCOeval runs — the reference pose task evaluates BOTH
        "keypoints" and "bbox" from the same detections
        (centernet_multi_pose.py:300-321)."""
        if coco_eval is None:
            return {}
        evals = (
            list(coco_eval)
            if isinstance(coco_eval, (list, tuple))
            else [(prefix, coco_eval)]
        )
        coco_results = []
        for image_id, det in results:
            coco_results.extend(self.task.to_coco_format(image_id, det))
        if jax.process_count() > 1:
            coco_results = _allgather_coco_results(coco_results)
        out: Dict[str, float] = {}
        for pfx, ev in evals:
            stats = ev(coco_results)
            out.update({f"test/{pfx}{k}": float(v) for k, v in stats.items()})
        self.logger.log_epoch(-1, out)
        return out
