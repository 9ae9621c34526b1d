"""Prediction heads (reference: CenterNet/models/heads.py:4-50).

Each head is 3x3 conv (-> head_conv ch) + ReLU + 1x1 conv (-> out ch).
Heatmap heads (name starts with "heatmap") get a final bias of -2.19
(sigmoid^-1(0.1) prior); all other heads use normal(std=0.001) weights and
zero bias — matching the reference's ``init_weights``/``fill_fc_weights``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
from flax import linen as nn


class HeadConv(nn.Module):
    """One prediction head (reference HeadConv, heads.py:4-25)."""

    out_channels: int
    head_conv: int
    is_heatmap: bool = False  # heatmap heads: default weight init, bias -2.19
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Non-heatmap heads use normal(0.001)/zero-bias like the reference's
        # fill_fc_weights; heatmap heads keep the default conv init but start
        # from a -2.19 output bias (heads.py:45-50).
        w_init = (
            nn.initializers.lecun_normal()
            if self.is_heatmap
            else nn.initializers.normal(0.001)
        )
        x = nn.Conv(
            self.head_conv,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=True,
            kernel_init=w_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_channels,
            (1, 1),
            use_bias=True,
            kernel_init=w_init,
            bias_init=nn.initializers.constant(-2.19 if self.is_heatmap else 0.0),
            dtype=self.dtype,
        )(x)
        # Head outputs feed losses/decode: keep them f32 regardless of the
        # backbone compute dtype.
        return x.astype(jnp.float32)


class CenterHead(nn.Module):
    """Bundle of named heads over one feature map (reference CenterHead,
    heads.py:28-50). ``heads`` maps name -> out_channels."""

    heads: Mapping[str, int]
    head_conv: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        out = {}
        for name, channels in self.heads.items():
            out[name] = HeadConv(
                channels,
                self.head_conv,
                is_heatmap=name.startswith("heatmap"),
                dtype=self.dtype,
                name=name,
            )(x)
        return out
