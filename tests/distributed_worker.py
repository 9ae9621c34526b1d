"""Worker for the TRUE 2-process distributed smoke test (VERDICT r3 weak
#6: the multi-process data plane was only ever simulated). Launched as a
subprocess by tests/test_distributed_smoke.py:

    python tests/distributed_worker.py <pid> <nproc> <port> <out.json>

Each process: 2 virtual CPU devices, jax.distributed.initialize via
``maybe_init_distributed`` (the exact production code path the CLIs call),
a process-sharded DataLoader epoch, one global-batch train step through
``Trainer._put_batch`` (jax.make_array_from_process_local_data) +
``_train_step``, and a length-prefixed COCO-results allgather. Writes its
observed loss + gathered results as JSON.
"""

import json
import os
import sys


def build_samples(n: int, size: int = 64):
    """Deterministic per-index samples shared by workers AND the
    single-process reference computation in the test."""
    import numpy as np

    from centernet_tpu.data import (
        CategoryIdToClass,
        CenterDetectionSample,
        ComposeSample,
        Identity,
        ImageAugmentation,
    )
    from centernet_tpu.tasks.detection import CenterNetDetection

    pipeline = ComposeSample(
        [
            ImageAugmentation(Identity(), None),
            CategoryIdToClass(CenterNetDetection.valid_ids),
            CenterDetectionSample(),
        ]
    )
    anns = [
        {"bbox": [10.0, 12.0, 20.0, 30.0], "category_id": 1},
        {"bbox": [30.0, 8.0, 14.0, 18.0], "category_id": 3},
    ]
    samples = []
    for i in range(n):
        img = (255 * np.random.RandomState(i).rand(size, size, 3)).astype(
            np.uint8
        )
        samples.append(pipeline(img, [dict(a) for a in anns]))
    return samples


class _ListDataset:
    def __init__(self, samples):
        self.samples = samples

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


GLOBAL_BATCH = 4
SIZE = 64


def main() -> None:
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    os.environ["CENTERNET_TPU_DISTRIBUTED"] = "1"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var (it prepends
    # itself regardless); pin the platform via config BEFORE the backend
    # initializes, exactly as tests/conftest.py and __graft_entry__ do
    jax.config.update("jax_platforms", "cpu")

    from centernet_tpu.parallel.mesh import maybe_init_distributed

    assert maybe_init_distributed()

    import numpy as np

    # share the suite's compile cache (workers compile the same graphs)
    cache = os.environ.get("CENTERNET_TPU_TEST_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc
    assert len(jax.local_devices()) == 2

    from centernet_tpu.data.loader import DataLoader
    from centernet_tpu.parallel.mesh import make_mesh
    from centernet_tpu.parallel.trainer import (
        Trainer,
        _allgather_coco_results,
    )
    from centernet_tpu.tasks.detection import CenterNetDetection

    task = CenterNetDetection("res_18")
    mesh = make_mesh()
    trainer = Trainer(task, mesh=mesh, max_epochs=1)
    trainer.init_state(input_hw=(SIZE, SIZE))
    trainer._compile_steps()

    dataset = _ListDataset(build_samples(GLOBAL_BATCH, SIZE))
    loader = DataLoader(
        dataset, batch_size=GLOBAL_BATCH, shuffle=False, num_workers=1,
        worker_mode="thread", drop_last=True,
    )
    # the loader derives process_index/count from the initialized runtime
    assert loader.process_count == nproc

    losses = []
    rows_seen = []
    for batch in loader:
        rows_seen.append(int(batch[0].shape[0]))
        dev_batch = trainer._put_batch(batch)
        trainer.state, stats = trainer._train_step(trainer.state, dev_batch)
        losses.append(float(stats["loss"]))

    # length-prefixed allgather of per-process (ragged) COCO results
    local_results = [
        {"image_id": pid * 10 + j, "score": float(pid + j)} for j in range(pid + 1)
    ]
    gathered = _allgather_coco_results(list(local_results))

    with open(out_path, "w") as f:
        json.dump(
            {
                "pid": pid,
                "devices": len(jax.devices()),
                "local_rows": rows_seen,
                "losses": losses,
                "gathered": gathered,
            },
            f,
        )


if __name__ == "__main__":
    main()
