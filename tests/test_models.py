"""Model shape tests across the full backbone zoo
(mirrors reference tests/test_models.py:12-39, at reduced input size for CI
speed — stride/shape behavior is resolution-independent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centernet_tpu.models import CenterHead, create_model

SUPPORTED = ["res_18", "res_101", "resdcn_18", "resdcn_101", "dla_34", "hourglass"]
POSE_HEADS = {
    "heatmap": 1,
    "width_height": 2,
    "regression": 2,
    "heatmap_keypoints": 17,
    "heatpoint_offset": 2,
    "keypoints": 34,
}
SIZE = 128


@pytest.mark.parametrize("arch", SUPPORTED)
def test_model_shapes(arch):
    model = create_model(arch)
    head = CenterHead(POSE_HEADS, head_conv=64)

    x = jnp.asarray(np.random.rand(1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    outs = model.apply(variables, x, False)

    assert isinstance(outs, list)
    expected_stacks = 2 if arch == "hourglass" else 1
    assert len(outs) == expected_stacks

    hvars = head.init(jax.random.PRNGKey(1), outs[-1])
    preds = head.apply(hvars, outs[-1])

    for name, channels in POSE_HEADS.items():
        assert preds[name].shape == (1, SIZE // 4, SIZE // 4, channels), name


def test_heatmap_bias_prior():
    head = CenterHead({"heatmap": 80, "width_height": 2}, head_conv=64)
    x = jnp.zeros((1, 8, 8, 64))
    v = head.init(jax.random.PRNGKey(0), x)
    hm_bias = v["params"]["heatmap"]["Conv_1"]["bias"]
    np.testing.assert_allclose(np.asarray(hm_bias), -2.19, rtol=1e-6)
    wh_bias = v["params"]["width_height"]["Conv_1"]["bias"]
    np.testing.assert_allclose(np.asarray(wh_bias), 0.0)


def test_factory_rejects_unknown():
    with pytest.raises(ValueError):
        create_model("vgg_16")
