"""uint8 train batches normalize ON DEVICE (task.prep_images; default CLI
train pipeline ships uint8 — 4x less host->device traffic). One train step
from identical state must match the host-normalized f32 path (the formulas
are identical: (x/255 - mean)/std as x*scale + bias)."""

import jax
import jax.numpy as jnp
import numpy as np

from centernet_tpu import CenterNetDetection
from centernet_tpu.data.loader import default_collate
from centernet_tpu.data.transforms import Normalize


def _target(rng, b, n=8):
    boxes = np.zeros((b, n, 4), np.float32)
    xy = rng.uniform(5, 40, (b, 3, 2))
    wh = rng.uniform(4, 16, (b, 3, 2))
    boxes[:, :3] = np.concatenate([xy, xy + wh], axis=-1)
    return {
        "boxes": boxes,
        "classes": rng.integers(0, 80, (b, n)).astype(np.int32),
        "keypoints_raw": np.zeros((b, n, 17, 3), np.float32),
        "valid": (np.arange(n) < 3)[None].repeat(b, 0),
    }


def test_uint8_batch_matches_host_normalized():
    task = CenterNetDetection("res_18")
    variables = task.init_variables(jax.random.PRNGKey(0), (64, 64))
    rng = np.random.default_rng(0)

    img8 = (rng.random((2, 64, 64, 3)) * 255).astype(np.uint8)
    norm = Normalize(task.mean, task.std)
    imgf = np.stack([norm(im.copy()) for im in img8])
    target = _target(rng, 2)

    to_dev = lambda t: {k: jnp.asarray(v) for k, v in t.items()}

    def loss_of(params, img):
        outputs, _ = task.model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            task.prep_images(img),
            True,
            mutable=["batch_stats"],
        )
        tgt = task.maybe_encode_targets(img.shape[1:3], to_dev(target))
        return task.loss(outputs, tgt)[0]

    g = jax.jit(jax.value_and_grad(loss_of))
    l1, g1 = g(variables["params"], jnp.asarray(img8))
    l2, g2 = g(variables["params"], jnp.asarray(imgf))

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)

    # Compare GRADIENTS, not post-Adam params (at step 1 Adam is
    # ~lr*sign(grad): any rounding flips signs of near-zero grads) — and
    # compare against the gradient's MEASURED sensitivity to f32 rounding:
    # the two normalizations agree to 1 ulp (~2.4e-7), but the init-state
    # gradient through BN+focal amplifies a 1-ulp input perturbation to
    # ~3.5% on the deconv kernels (measured: identical 0.1255 max diff for
    # a pure f32 perturbation of the same magnitude). The uint8 path must
    # be no further from the f32 path than that intrinsic rounding noise.
    rng2 = np.random.default_rng(1)
    pert = imgf + (np.abs(imgf) + 1e-3) * 2.4e-7 * rng2.choice(
        [-1.0, 1.0], imgf.shape
    )
    _, g3 = g(variables["params"], jnp.asarray(pert.astype(np.float32)))

    def maxdiff(a, b):
        d = jax.tree_util.tree_map(
            lambda x, y: float(jnp.abs(x - y).max()), a, b
        )
        return max(jax.tree_util.tree_leaves(d))

    chaos = maxdiff(g2, g3)  # intrinsic 1-ulp sensitivity
    got = maxdiff(g1, g2)  # uint8 path vs host-normalized path
    assert got <= 5.0 * max(chaos, 1e-6), (
        f"uint8-path grads off by {got}, rounding baseline {chaos}"
    )


def test_collate_preserves_uint8():
    """default_collate must NOT silently upcast integer images — an
    unnormalized f32 batch would skip prep_images and feed 0..255 values
    to the model."""
    img = np.zeros((8, 8, 3), np.uint8)
    t = {"valid": np.ones(4, bool)}
    imgs, _ = default_collate([(img, t), (img, t)])
    assert imgs.dtype == np.uint8

    imgs, _ = default_collate([(img.astype(np.float64), t)])
    assert imgs.dtype == np.float32
