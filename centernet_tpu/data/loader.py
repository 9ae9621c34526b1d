"""Host input pipeline: multi-worker prefetching loader.

Replaces torch ``DataLoader(num_workers=8, pin_memory=True)`` (reference:
centernet_detection.py:363-375). Samples are produced by a worker pool,
batched into fixed-shape numpy arrays, and handed to the trainer which
device-puts them with a `data`-axis sharding. A small prefetch queue keeps
the TPU fed while the host prepares the next batch.

Worker modes:
* ``thread`` (default) — cv2's warp/blur release the GIL, but the
  annotation write-backs/padding/collate do not; measured GIL-serial
  remainder ~6 ms/sample caps one host at ~170 samples/s regardless of
  cores (benchmarks/bench_input_pipeline.py).
* ``process`` — a forked worker-process pool (the reference's
  ``num_workers=8`` worker processes): sidesteps the GIL entirely; each
  worker must not touch JAX (the transform stack is cv2/numpy-only).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np

_WORKER_DATASET = None


def _worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset
    try:  # cv2's internal thread pool misbehaves across fork
        import cv2

        cv2.setNumThreads(0)
    except ImportError:
        pass


def _worker_get(i):
    return _WORKER_DATASET[i]


def default_collate(samples):
    """Stack (img, target_dict) samples into batched numpy arrays."""
    imgs = np.stack([np.asarray(s[0], np.float32) for s in samples])
    keys = samples[0][1].keys()
    target = {
        k: np.stack([np.asarray(s[1][k]) for s in samples]) for k in keys
    }
    return imgs, target


class DataLoader:
    """Minimal epoch-iterable loader with worker threads and prefetching."""

    def __init__(
        self,
        dataset,
        batch_size: int = 32,
        shuffle: bool = False,
        num_workers: int = 8,
        drop_last: bool = True,
        collate_fn: Callable = default_collate,
        seed: int = 0,
        prefetch: int = 2,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        worker_mode: str = "thread",
    ):
        """``batch_size`` is the GLOBAL batch. Under multi-controller JAX
        (one process per host) each process loads only its contiguous
        ``batch_size / process_count`` slice of every global batch — the
        per-rank sharded loading Lightning's DDP sampler provides the
        reference for free (centernet_detection.py:363-375). All processes
        derive the identical epoch permutation from the shared ``seed``, so
        the union of the slices is exactly the global batch.

        ``process_index`` / ``process_count`` default to the JAX runtime's
        view; pass explicitly to fake a process for testing."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"unknown worker_mode {worker_mode!r}")
        self.worker_mode = worker_mode
        if process_count is None:
            import jax

            process_count = jax.process_count()
            process_index = jax.process_index()
        self.process_index = int(process_index or 0)
        self.process_count = int(process_count)
        if self.process_count > 1:
            if batch_size % self.process_count:
                raise ValueError(
                    f"global batch_size {batch_size} must divide by "
                    f"process_count {self.process_count}"
                )
            if not drop_last:
                raise ValueError(
                    "multi-process loading requires drop_last=True (a "
                    "partial global batch cannot be evenly process-sharded)"
                )

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        per = self.batch_size // self.process_count
        lo = self.process_index * per
        for b in range(nb):
            g = order[b * self.batch_size : (b + 1) * self.batch_size]
            # this process's contiguous slice of the global batch — rows
            # [pi*per, (pi+1)*per) map onto the process's addressable mesh
            # devices (make_mesh orders devices process-major)
            yield g[lo : lo + per] if self.process_count > 1 else g

    def _get_pool(self):
        """Worker pool, created once and reused across epochs (forking a
        process pool per epoch multiplies the fork-after-JAX-init risk)."""
        pool = getattr(self, "_pool", None)
        if pool is not None:
            return pool
        if self.worker_mode == "process":
            import multiprocessing as mp

            ctx = mp.get_context("fork")
            self._pool = ctx.Pool(
                self.num_workers,
                initializer=_worker_init,
                initargs=(self.dataset,),
            )
        else:
            self._pool = ThreadPoolExecutor(self.num_workers)
        return self._pool

    def __del__(self):
        pool = getattr(self, "_pool", None)
        if pool is not None and self.worker_mode == "process":
            pool.terminate()

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            pool = self._get_pool()
            get = (
                _worker_get
                if self.worker_mode == "process"
                else self.dataset.__getitem__
            )
            for idxs in self._batches():
                if stop.is_set():
                    break
                samples = list(pool.map(get, [int(i) for i in idxs]))
                q.put(self.collate_fn(samples))
            q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
