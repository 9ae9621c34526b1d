"""Base CenterNet task (reference: CenterNet/centernet.py:9-119).

The reference couples model + loss + optimizer into a LightningModule. The
TPU-native design splits it functionally:

* ``CenterNetModel`` — a pure flax module: backbone + per-stack ``CenterHead``.
* ``CenterNet`` (this class) — a Task: owns the module, the arch-specific
  constants (head_conv=256 for dla/hourglass else 64, num_stacks=2 for
  hourglass else 1, TTA padding=127 for hourglass else 31, down_ratio=4 —
  reference centernet.py:15-17), a pure ``loss_fn(outputs, targets)``, and
  the optax optimizer (Adam + MultiStep LR, reference centernet.py:94-105).

Everything the trainer jits is a pure function of (params, batch); the Task
holds no device state.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..models import CenterHead, create_model


def arch_head_conv(arch: str) -> int:
    return 256 if ("dla" in arch or "hourglass" in arch) else 64


def arch_num_stacks(arch: str) -> int:
    return 2 if "hourglass" in arch else 1


def arch_test_padding(arch: str) -> int:
    return 127 if "hourglass" in arch else 31


class CenterNetModel(nn.Module):
    """Backbone + one CenterHead per supervision stack."""

    arch: str
    heads: Mapping[str, int]
    head_conv: int
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[Dict[str, jnp.ndarray]]:
        proto = create_model(self.arch, self.dtype)
        cls = type(proto)
        if self.remat:
            # Rematerialize backbone activations in the backward pass —
            # trades FLOPs for HBM, needed for the 2-stack hourglass at 512^2.
            cls = nn.remat(cls, static_argnums=(2,))
        kwargs = {
            name: getattr(proto, name)
            for name in type(proto).__dataclass_fields__
            if name not in ("parent", "name")
        }
        backbone = cls(**kwargs, name="backbone")
        feats = backbone(x, train)
        outs = []
        for i, feat in enumerate(feats):
            outs.append(
                CenterHead(
                    self.heads, self.head_conv, dtype=self.dtype,
                    name=f"head_{i}",
                )(feat)
            )
        return outs


class CenterNet:
    """Task base: model factory + optimizer + loss protocol."""

    heads: Mapping[str, int] = {}
    mean = (0.408, 0.447, 0.470)  # BGR (reference centernet_detection.py:29)
    std = (0.289, 0.274, 0.278)

    def __init__(
        self,
        arch: str = "dla_34",
        learning_rate: float = 25e-5,
        learning_rate_milestones: Optional[Sequence[int]] = None,
        dtype: Any = jnp.float32,
    ):
        self.arch = arch
        self.learning_rate = learning_rate
        self.learning_rate_milestones = list(learning_rate_milestones or [])
        self.head_conv = arch_head_conv(arch)
        self.num_stacks = arch_num_stacks(arch)
        self.padding = arch_test_padding(arch)
        self.down_ratio = 4
        self.dtype = dtype
        self.model = CenterNetModel(
            arch=arch,
            heads=dict(self.heads),
            head_conv=self.head_conv,
            dtype=dtype,
            remat="hourglass" in arch,
        )

    # -- hyperparameter persistence -------------------------------------------

    def hparams(self) -> Dict[str, Any]:
        """Everything needed to reconstruct this task from a checkpoint alone
        — the Lightning ``save_hyperparameters`` equivalent (reference
        centernet_detection.py:86, consumed by centernet_test.py:72-74).
        Subclasses extend with their task-specific arguments; eval-time
        options (TTA scales/flip, dtype) are intentionally NOT persisted —
        they are load-time choices."""
        return {
            "task": type(self).__name__,
            "arch": self.arch,
            "learning_rate": self.learning_rate,
            "learning_rate_milestones": self.learning_rate_milestones,
        }

    # -- model plumbing ------------------------------------------------------

    def init_variables(self, rng, input_hw: Tuple[int, int] = (512, 512)):
        x = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
        return self.model.init(rng, x, False)

    def prep_images(self, x):
        """Normalize integer-dtype image batches ON DEVICE: the train loader
        can ship uint8 straight from the augmenter (4x less host->device
        and shm-ring traffic than f32), and `(x/255 - mean)/std` fuses into
        the first conv under jit. Float inputs pass through untouched —
        they were normalized on the host (eval/TTA paths), so this is safe
        at every model entry point."""
        if jnp.issubdtype(x.dtype, jnp.integer):
            from ..data.transforms import normalize_coeffs

            scale, bias = normalize_coeffs(self.mean, self.std)
            x = x.astype(jnp.float32) * jnp.asarray(scale) + jnp.asarray(bias)
        return x

    def apply(self, variables, x, train: bool = False, mutable=False):
        return self.model.apply(
            variables, self.prep_images(x), train, mutable=mutable
        )

    @staticmethod
    def _mask_valid_region(hm_sig, valid_hw):
        """Zero heatmap scores outside the reference-padded region.

        TTA bucket quantization (tasks/detection.py:tta_bucket) extends
        the canvas past the reference's ``(d|31)+1`` geometry with zero
        pixels. A zero-input region still scores sigmoid(-2.19) ~= 0.1
        (the heatmap head's bias prior, models/heads.py), and the 3x3
        maxpool pseudo-NMS keeps every cell of a constant plateau — so an
        unmasked bucket margin floods the fixed top-K pool with ~0.1-score
        candidates that unpad to out-of-image coordinates and can evict
        real low-score detections (round-4 advisor finding). ``valid_hw``
        [B, 2] int32 is the reference-region extent in heatmap cells;
        cells at or beyond it are zeroed (scores are post-sigmoid > 0, so
        zeros never reach top-K before any real cell). None = no-op."""
        if valid_hw is None:
            return hm_sig
        b, h, w, _ = hm_sig.shape
        ys = jax.lax.broadcasted_iota(jnp.int32, (b, h, w, 1), 1)
        xs = jax.lax.broadcasted_iota(jnp.int32, (b, h, w, 1), 2)
        ok = (ys < valid_hw[:, 0][:, None, None, None]) & (
            xs < valid_hw[:, 1][:, None, None, None]
        )
        return hm_sig * ok.astype(hm_sig.dtype)

    # -- batched fixed-shape serving geometry -----------------------------------

    def prepare_image_fixed(self, img_hwc, size: int = 512):
        """Resize longest side to ``size`` and center-pad to ``size`` x
        ``size`` (the reference's validation geometry,
        centernet_detection.py:317-341) — every image lands on the same
        shape so inference batches. Returns (image [size, size, 3]
        normalized, meta for undoing). Shared by both tasks'
        ``predict_batch``."""
        h, w = img_hwc.shape[:2]
        scale = size / max(h, w)
        new_h, new_w = round(h * scale), round(w * scale)
        img = jax.image.resize(
            jnp.asarray(img_hwc, jnp.float32), (new_h, new_w, 3), "bilinear"
        )
        pad_t = (size - new_h) // 2
        pad_l = (size - new_w) // 2
        img = jnp.pad(
            img,
            ((pad_t, size - new_h - pad_t), (pad_l, size - new_w - pad_l),
             (0, 0)),
        )
        img = (img - jnp.asarray(self.mean)) / jnp.asarray(self.std)
        meta = {"scale": [new_w / w, new_h / h], "padding": [pad_l, pad_t]}
        return img, meta

    # -- training protocol ----------------------------------------------------

    def loss(self, outputs, target) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        raise NotImplementedError

    # -- on-device target encoding ---------------------------------------------

    def maybe_encode_targets(self, input_hw: Tuple[int, int], target):
        """If ``target`` holds raw padded annotations (produced by
        ``data.PaddedAnnotationSample``), run the task's vectorized target
        encoder on device inside the jitted step; already-encoded targets
        pass through.  This moves the exp-heavy gaussian splats off the host
        (the reference encodes per-sample in DataLoader workers,
        sample/ctdet.py:39-90 — microseconds on the VPU vs ~300 ms/sample of
        host CPU here)."""
        if "boxes" in target:
            return self.encode_targets(input_hw, target)
        return target

    def encode_targets(self, input_hw: Tuple[int, int], target):
        raise NotImplementedError

    def configure_optimizer(self, steps_per_epoch: int = 1) -> optax.GradientTransformation:
        """Adam with MultiStepLR(milestones, gamma=0.1) stepped per epoch
        (reference centernet.py:94-105). ``steps_per_epoch`` converts the
        epoch milestones into step boundaries for the optax schedule."""
        if self.learning_rate_milestones:
            boundaries = {
                int(m) * steps_per_epoch: 0.1 for m in self.learning_rate_milestones
            }
            schedule = optax.piecewise_constant_schedule(
                self.learning_rate, boundaries
            )
        else:
            schedule = optax.constant_schedule(self.learning_rate)
        # exposed so the trainer's LR monitor reads the ACTUAL schedule
        # instead of re-deriving it (single source of truth)
        self.lr_schedule = schedule
        return optax.adam(schedule)
