"""Spatially-sharded inference (parallel/spatial.py): the forward+decode
jitted with the image H axis sharded over the ``model`` mesh axis must
produce EXACTLY the single-device detections — GSPMD inserts the conv halo
exchanges; nothing in the model may silently assume an unsharded H.

The reference has no analog (DDP-only, SURVEY.md §2 parallelism table);
this is the latency-scaling axis data parallelism cannot provide.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from centernet_tpu.parallel.mesh import make_mesh
from centernet_tpu.parallel.spatial import make_spatial_infer
from centernet_tpu.tasks.detection import CenterNetDetection


def _ref_and_sharded(arch, n_data, n_model, size=128):
    task = CenterNetDetection(arch, dtype=jnp.float32)
    variables = task.init_variables(jax.random.PRNGKey(0), (size, size))
    img = np.random.default_rng(0).random((n_data, size, size, 3), np.float32)
    ref = np.array(task._infer_decode_jit(variables, jnp.asarray(img), False))
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    got = np.array(make_spatial_infer(task, mesh)(variables, jnp.asarray(img)))
    return ref, got


@pytest.mark.parametrize(
    "arch,n_data,n_model",
    [
        ("res_18", 2, 4),  # plain convs + deconv, 4-way spatial
        ("resdcn_18", 2, 2),  # banded DCN row-shift halos under sharding
        ("dla_34", 2, 2),  # DLAUp/IDAUp DCN aggregation under sharding
    ],
)
def test_spatial_sharding_matches_single_device(arch, n_data, n_model):
    ref, got = _ref_and_sharded(arch, n_data, n_model)
    np.testing.assert_allclose(got[..., :4], ref[..., :4], atol=1e-5)
    np.testing.assert_allclose(got[..., 4], ref[..., 4], atol=1e-5)
    # scores above the noise floor must agree on the class too (ties among
    # all-equal init scores may legitimately reorder)
    strong = ref[..., 4] > ref[..., 4].mean()
    assert (got[..., 5] == ref[..., 5])[strong].all()


def test_spatial_sharding_multi_pose():
    """The pose decode's K×K joint-snap gathers must stay exact when the
    feature H axis is sharded (57-col output: bbox4+score+kps34+class+hm17).
    """
    from centernet_tpu.tasks.multi_pose import CenterNetMultiPose

    task = CenterNetMultiPose("res_18", dtype=jnp.float32)
    variables = task.init_variables(jax.random.PRNGKey(0), (128, 128))
    img = np.random.default_rng(0).random((2, 128, 128, 3), np.float32)
    ref = np.array(task._infer_decode_jit(variables, jnp.asarray(img), False))
    mesh = make_mesh(n_data=2, n_model=4)
    got = np.array(make_spatial_infer(task, mesh)(variables, jnp.asarray(img)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_spatial_sharding_shape_guards():
    task = CenterNetDetection("res_18", dtype=jnp.float32)
    variables = task.init_variables(jax.random.PRNGKey(0), (128, 128))
    mesh = make_mesh(n_data=2, n_model=4)
    fn = make_spatial_infer(task, mesh)
    with pytest.raises(ValueError, match="divisible by the model axis"):
        fn(variables, jnp.zeros((2, 126, 128, 3), jnp.float32))
    with pytest.raises(ValueError, match="not divisible by data axis"):
        fn(variables, jnp.zeros((3, 128, 128, 3), jnp.float32))
