"""AOT serving-export round trip: export the batched serving function
(forward + fused decode, weights baked) to a StableHLO artifact, reload
it, and check bitwise-equal outputs vs the live function — plus the
loud-failure contracts (bad magic, wrong input shape)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centernet_tpu import CenterNetDetection, CenterNetMultiPose
from centernet_tpu.utils.export import (
    export_serving,
    load_serving,
    make_serving_fn,
)

SIZE = 64
B = 2


@pytest.mark.parametrize("task_cls", [CenterNetDetection, CenterNetMultiPose])
def test_export_roundtrip(tmp_path, task_cls):
    task = task_cls("res_18")
    variables = task.init_variables(jax.random.PRNGKey(0), (SIZE, SIZE))
    path = str(tmp_path / "serving.hlo")

    exp = export_serving(
        task, variables, path, input_size=SIZE, batch=B
    )
    assert exp.in_avals[0].shape == (B, SIZE, SIZE, 3)

    images = jnp.asarray(
        np.random.RandomState(0).rand(B, SIZE, SIZE, 3), jnp.float32
    )
    live = np.asarray(make_serving_fn(task, variables)(images))
    served = load_serving(path)
    got = np.asarray(served(images))
    # top-k tie ORDER is unspecified and may differ between the live and
    # the exported compilation (untrained heatmaps tie everywhere), so
    # compare the detection row SETS per image, not the order.
    assert got.shape == live.shape
    for i in range(B):
        a = got[i][np.lexsort(got[i].T)]
        b = live[i][np.lexsort(live[i].T)]
        np.testing.assert_allclose(a, b, atol=1e-6)
    assert served.info["platforms"]


def test_export_bad_magic(tmp_path):
    p = tmp_path / "junk.hlo"
    p.write_bytes(b"NOTANEXPORT")
    with pytest.raises(ValueError, match="bad magic"):
        load_serving(str(p))


def test_export_wrong_shape(tmp_path):
    task = CenterNetDetection("res_18")
    variables = task.init_variables(jax.random.PRNGKey(0), (SIZE, SIZE))
    path = str(tmp_path / "serving.hlo")
    export_serving(task, variables, path, input_size=SIZE, batch=B)
    served = load_serving(path)
    bad = jnp.zeros((B, SIZE * 2, SIZE * 2, 3), jnp.float32)
    with pytest.raises(Exception):
        served(bad)
