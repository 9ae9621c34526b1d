"""centernet_tpu — a TPU-native (JAX / XLA / Pallas / pjit) CenterNet framework.

Brand-new implementation of the capabilities of
tteepe/CenterNet-pytorch-lightning: COCO object detection and multi-person
pose estimation with ResNet / ResNet-DCN / DLA-34 / Hourglass backbones,
designed TPU-first — NHWC layouts, fixed shapes, fused decode kernels, and
data-parallel training over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy re-exports so `import centernet_tpu` stays light and ops-only uses
    # don't pull in flax/optax.
    if name in ("CenterNet", "CenterNetDetection", "CenterNetMultiPose"):
        from . import tasks

        return getattr(tasks, name)
    raise AttributeError(f"module 'centernet_tpu' has no attribute {name!r}")


__all__ = ["CenterNet", "CenterNetDetection", "CenterNetMultiPose"]
