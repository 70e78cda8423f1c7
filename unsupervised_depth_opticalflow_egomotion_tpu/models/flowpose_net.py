"""Pose regressor from normalized optical flow (legacy model family).

Mirrors /root/reference/core/networks/structures/flowposenet.py: a 7-conv
stack over 2-channel flow, 1x1 head, global mean pool, x0.01 scaling.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv


class FlowPoseNet(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow):
        x = flow
        specs = [(16, 7, 3), (32, 5, 2), (64, 3, 1), (128, 3, 1), (256, 3, 1), (256, 3, 1), (256, 3, 1)]
        for ch, k, p in specs:
            x = Conv(ch, kernel=k, stride=2, padding=p, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = Conv(6, kernel=1, stride=1, padding=0, dtype=self.dtype)(x)
        out = jnp.mean(x, axis=(1, 2))
        return 0.01 * out
