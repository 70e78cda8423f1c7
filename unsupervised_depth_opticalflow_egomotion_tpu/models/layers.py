"""Shared conv building blocks (NHWC Flax linen).

Padding is always explicit (torch-style symmetric) rather than XLA 'SAME':
for stride-2 convs the two conventions pad different sides, which shifts the
sampling grid and changes the feature geometry that the flow decoder's
coarse-to-fine warping depends on.

Initializers mirror the reference nets' effective init: torch Conv2d default
kaiming-uniform(a=sqrt(5)) for the flow/pose stacks, kaiming-normal(fan_out)
for the ResNet encoder (depth_model.py:34-39).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.packed_conv import (
    packed_conv,
    packed_conv_reflect,
    packed_conv_reflect_rect,
)

# torch Conv2d default: uniform with bound 1/sqrt(fan_in) == variance_scaling(1/3).
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
kaiming_normal_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _ConvParams(nn.Module):
    """Holds a conv's (kernel, bias) with nn.Conv's exact param tree.

    When a layer runs in space-to-depth packed mode the conv math goes through
    ops.packed_conv, but the LOGICAL [kh,kw,Cin,Co] kernel stays the
    parameter: checkpoints, torch ports (utils/torch_port.py) and the parity
    tests address the same {.../Conv_0/kernel} leaves regardless of packing.
    Instantiate with name="Conv_0" to mirror the nn.Conv child naming.
    """

    features: int
    in_features: int
    kernel: int = 3
    use_bias: bool = True
    kernel_init: Any = torch_conv_init

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel, self.kernel, self.in_features, self.features),
            jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return k, b


class ConvLReLU(nn.Module):
    """Conv2d + LeakyReLU(0.1) (net_utils.py:7-11).

    With ``packed=True`` input AND output are space-to-depth packed tensors
    ([B,H/2,W/2,4C]); only kernel=3, padding=1, dilation=1, stride in {1,2}
    are supported in that mode.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    packed: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.packed:
            assert (self.kernel, self.padding, self.dilation) == (3, 1, 1)
            k, b = _ConvParams(
                self.features, x.shape[-1] // 4, name="Conv_0"
            )()
            x = packed_conv(x, k.astype(self.dtype), b, self.stride)
            return nn.leaky_relu(x, 0.1)
        p = self.padding
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=torch_conv_init,
            dtype=self.dtype,
        )(x)
        return nn.leaky_relu(x, 0.1)


class Conv(nn.Module):
    """Plain Conv2d with torch-style symmetric padding."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.padding
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            kernel_init=torch_conv_init,
            dtype=self.dtype,
        )(x)


class ReflectConv3x3(nn.Module):
    """Reflection-padded 3x3 conv (depth_model.py:111-126).

    ``packed`` selects the space-to-depth layout: False = plain NHWC,
    True = (2,2)-packed, "24" = (2,4)-packed (the scale-0 decoder segment,
    where 16 logical channels x 8 = 128 fills the lane dim; PERF.md). The
    reflection halo is built in packed space (ops.packed_conv) either way.
    """

    features: int
    packed: bool | str = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.packed == "24":
            k, b = _ConvParams(self.features, x.shape[-1] // 8, name="Conv_0")()
            return packed_conv_reflect_rect(x, k.astype(self.dtype), b, 2, 4)
        if self.packed:
            k, b = _ConvParams(self.features, x.shape[-1] // 4, name="Conv_0")()
            return packed_conv_reflect(x, k.astype(self.dtype), b)
        # width-1 reflection built from plain slices (jnp.pad mode='reflect'
        # lowers through a generic reverse that is slower on TPU)
        x = jnp.concatenate([x[:, 1:2], x, x[:, -2:-1]], axis=1)
        x = jnp.concatenate([x[:, :, 1:2], x, x[:, :, -2:-1]], axis=2)
        return nn.Conv(
            self.features,
            (3, 3),
            padding="VALID",
            kernel_init=torch_conv_init,
            dtype=self.dtype,
        )(x)


class PackedBatchNorm(nn.Module):
    """BatchNorm over the LOGICAL channels of a space-to-depth packed tensor.

    Exact (up to float summation order): the ``phases`` packed channels of a
    logical channel partition its pixels into equal-count groups, so the
    logical batch mean / E[x^2] are the equal-weight averages of the
    per-packed-channel moments. Parameter and batch_stats leaves carry the
    LOGICAL channel count and nn.BatchNorm's exact names ({scale, bias} /
    {mean, var}), so checkpoints are packing-layout-independent.

    Matches nn.BatchNorm(momentum, epsilon, use_fast_variance=True): stats
    in float32, normalization in ``dtype``.
    """

    use_running_average: bool
    phases: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):
        c = xp.shape[-1] // self.phases
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = xp.astype(jnp.float32)
            # per-packed-channel moments, phase-combined to logical channels
            m_p = jnp.mean(xf, axis=(0, 1, 2)).reshape(self.phases, c)
            s_p = jnp.mean(jnp.square(xf), axis=(0, 1, 2)).reshape(self.phases, c)
            mean = jnp.mean(m_p, axis=0)
            var = jnp.mean(s_p, axis=0) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1.0 - self.momentum) * var
                )
        mul = jax.lax.rsqrt(var.astype(self.dtype) + jnp.asarray(
            self.epsilon, self.dtype
        )) * scale.astype(self.dtype)
        mul = jnp.tile(mul, self.phases)
        off = jnp.tile(bias.astype(self.dtype), self.phases) - jnp.tile(
            mean.astype(self.dtype), self.phases
        ) * mul
        return xp.astype(self.dtype) * mul + off


def max_pool_3x3_s2_p1(x):
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) on NHWC."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )
