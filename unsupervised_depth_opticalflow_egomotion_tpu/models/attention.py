"""DANet-style position/channel attention modules.

Equivalents of /root/reference/core/networks/structures/attention.py
(PAM_Module / CAM_Module). In the reference these are imported by pose_cnn
but unused in its live forward; they are provided here for architectural
parity and for experimentation.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PositionAttention(nn.Module):
    """Spatial self-attention (PAM_Module, attention.py:18-50)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        q = nn.Conv(max(c // 8, 1), (1, 1), dtype=self.dtype, name="query_conv")(x)
        k = nn.Conv(max(c // 8, 1), (1, 1), dtype=self.dtype, name="key_conv")(x)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="value_conv")(x)
        n = h * w
        q = q.reshape(b, n, -1)
        k = k.reshape(b, n, -1)
        v = v.reshape(b, n, c)
        energy = jnp.einsum("bnd,bmd->bnm", q, k)
        attn = nn.softmax(energy, axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attn, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma * out + x


class ChannelAttention(nn.Module):
    """Channel self-attention (CAM_Module, attention.py:53-83)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        flat = x.reshape(b, n, c)
        energy = jnp.einsum("bnc,bnd->bcd", flat, flat)
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = nn.softmax(energy_new, axis=-1)
        out = jnp.einsum("bcd,bnd->bnc", attn, flat).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma * out + x
