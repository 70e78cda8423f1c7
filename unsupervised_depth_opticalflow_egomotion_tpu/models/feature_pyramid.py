"""Six-level siamese feature encoder for the flow network.

Mirrors /root/reference/core/networks/structures/feature_pyramid.py: pairs of
(stride-2, stride-1) 3x3 convs with LeakyReLU(0.1), channels
16-32-64-96-128-196, returning the six stride-1 outputs at 1/2 ... 1/64
resolution.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvLReLU

_CHANNELS = (16, 32, 64, 96, 128, 196)


class FeaturePyramid(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img):
        feats = []
        x = img
        for ch in _CHANNELS:
            x = ConvLReLU(ch, stride=2, dtype=self.dtype)(x)
            x = ConvLReLU(ch, stride=1, dtype=self.dtype)(x)
            feats.append(x)
        return tuple(feats)
