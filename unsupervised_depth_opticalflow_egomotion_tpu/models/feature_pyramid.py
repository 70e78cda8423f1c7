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

from ..ops.packed_conv import depth_to_space, space_to_depth
from .layers import ConvLReLU

_CHANNELS = (16, 32, 64, 96, 128, 196)


class FeaturePyramid(nn.Module):
    """With ``packed=True`` the 16/32-channel levels (the resolution-dominant
    convs) run space-to-depth packed (see ops/packed_conv.py); child names are
    pinned so the param tree matches the unpacked mode."""

    packed: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img):
        feats = []
        x = img
        n_packed = 2 if self.packed else 0
        for lvl, ch in enumerate(_CHANNELS):
            pk = lvl < n_packed
            if self.packed and lvl == 0:
                x = space_to_depth(x)
            x = ConvLReLU(
                ch, stride=2, packed=pk, name=f"ConvLReLU_{2 * lvl}",
                dtype=self.dtype,
            )(x)
            x = ConvLReLU(
                ch, stride=1, packed=pk, name=f"ConvLReLU_{2 * lvl + 1}",
                dtype=self.dtype,
            )(x)
            if self.packed and lvl == n_packed - 1:
                x = depth_to_space(x)
            feats.append(depth_to_space(x) if pk and lvl < n_packed - 1 else x)
        return tuple(feats)
