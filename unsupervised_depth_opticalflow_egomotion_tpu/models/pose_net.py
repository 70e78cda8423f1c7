"""Pose regressor: 7-conv CNN + spatial self-attention refinement (NHWC).

Mirrors /root/reference/core/networks/structures/pose_cnn.py: strided conv
stack 16-32-64-128-256-256-256 with ReLU, a 1x1 head to 6*(N-1) channels, and
the custom attention refinement -- Q/K/V linear maps over the flattened
spatial dim, energy softmax over axis 1, four refine convs -- whose mean-pooled
output is added as a delta. Both branches scale by 0.01
(pose_cnn.py:70-93).

NOTE: like the reference, the attention Linear layers are sized to the
flattened conv-tower output (H/128 x W/128 spatial positions), so the module
is specialized to one input resolution per instantiation.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv, torch_conv_init


class PoseNet(nn.Module):
    num_input_frames: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs):
        n_out = 6 * (self.num_input_frames - 1)

        x = imgs
        specs = [
            (16, 7, 3),
            (32, 5, 2),
            (64, 3, 1),
            (128, 3, 1),
            (256, 3, 1),
            (256, 3, 1),
            (256, 3, 1),
        ]
        for ch, k, p in specs:
            x = Conv(ch, kernel=k, stride=2, padding=p, dtype=self.dtype)(x)
            x = nn.relu(x)
        base = Conv(n_out, kernel=1, stride=1, padding=0, dtype=self.dtype)(x)

        delta = self._atten_refine(base, n_out)

        out = jnp.mean(base, axis=(1, 2))
        out = 0.01 * out.reshape(-1, self.num_input_frames - 1, 6)
        return out + delta

    def _atten_refine(self, base, n_out):
        b, h, w, c = base.shape
        n_sp = h * w
        # [B, C, N] layout to match the reference's channel-attention math.
        flat = jnp.transpose(base.reshape(b, n_sp, c), (0, 2, 1))

        dense = lambda name: nn.Dense(
            n_sp, kernel_init=torch_conv_init, dtype=self.dtype, name=name
        )
        query = dense("query_fc")(flat)
        key = dense("key_fc")(flat)
        value = dense("value_fc")(flat)

        energy = jnp.einsum("bcn,bdn->bcd", query, key)  # [B,C,C]
        p_mat = nn.softmax(energy, axis=1)
        attended = jnp.einsum("bcd,bdn->bcn", p_mat, value)

        y = jnp.concatenate([flat, attended], axis=1)  # [B,2C,N]
        y = jnp.transpose(y, (0, 2, 1)).reshape(b, h, w, 2 * c)

        y = nn.relu(Conv(n_out, kernel=1, stride=1, padding=0, dtype=self.dtype)(y))
        for _ in range(3):
            y = nn.relu(Conv(n_out, kernel=3, stride=1, padding=1, dtype=self.dtype)(y))
        y = Conv(n_out, kernel=1, stride=1, padding=0, dtype=self.dtype)(y)

        delta = jnp.mean(y, axis=(1, 2))
        return 0.01 * delta.reshape(-1, self.num_input_frames - 1, 6)
