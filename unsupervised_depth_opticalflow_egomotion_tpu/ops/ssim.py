"""SSIM over 3x3 mean windows (NHWC).

Matches /root/reference/core/networks/pytorch_ssim/ssim.py: 3x3 average-pool
statistics with stride 1 and zero padding 1 (torch AvgPool2d counts the padded
zeros in the divisor, so border windows are averaged over 9 taps regardless --
we reproduce that with a constant 1/9 divisor), C1=0.01^2, C2=0.03^2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _avg3x3(x: jax.Array) -> jax.Array:
    summed = jax.lax.reduce_window(
        x,
        np.zeros((), x.dtype)[()],
        jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return summed / jnp.asarray(9.0, x.dtype)


def ssim_xla(x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-pixel SSIM map of two NHWC images (XLA formulation).

    Computed in f32 regardless of the input compute dtype (the reference runs
    f32 throughout): bf16's 8-bit mantissa makes the variance E[x^2]-E[x]^2
    catastrophically cancel in smooth image regions, driving (sigma_x +
    sigma_y + c2) through zero -- observed as a NaN loss_flow_ssim GRADIENT
    on the first full-resolution KITTI-like batch, which poisons training in
    one optimizer step. The f32 stats cost ~nothing (the pools are
    bandwidth-bound either way).
    """
    dt = x.dtype
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    c1 = 0.01**2
    c2 = 0.03**2
    mu_x = _avg3x3(x)
    mu_y = _avg3x3(y)
    sigma_x = _avg3x3(x * x) - mu_x * mu_x
    sigma_y = _avg3x3(y * y) - mu_y * mu_y
    sigma_xy = _avg3x3(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    return (num / den).astype(dt)


# Selected implementation, read at trace time. "pallas" routes through the
# fused VMEM-resident kernel (ops/pallas/ssim_fused.py) on TPU; it falls back
# to the XLA formulation off-TPU or when a plane exceeds the VMEM budget.
# Config.ssim_impl sets this via set_ssim_impl() before the step is traced.
_SSIM_IMPL = "xla"


def set_ssim_impl(impl: str) -> None:
    if impl not in ("xla", "pallas"):
        raise ValueError(f"ssim_impl must be 'xla' or 'pallas', got {impl!r}")
    global _SSIM_IMPL
    _SSIM_IMPL = impl


def ssim(x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-pixel SSIM map; impl selected by set_ssim_impl (default XLA).

    Identical semantics either way (pallas/ssim_fused.py pins the values
    and gradients against this formulation in tests/test_pallas_kernels.py).
    """
    if _SSIM_IMPL == "pallas":
        from .pallas.ssim_fused import ssim_fused

        return ssim_fused(x, y)
    return ssim_xla(x, y)
