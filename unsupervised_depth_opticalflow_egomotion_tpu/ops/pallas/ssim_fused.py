"""Fused Pallas TPU kernel for the 3x3 SSIM map (fwd + analytic bwd).

The XLA formulation (ops/ssim.py) materializes ~10 full-resolution f32
intermediates per call (5 pooled statistics + the elementwise chain), and
autodiff doubles that in the backward; at b8 256x832x3 each intermediate is
a 20 MB HBM round trip. These kernels keep one [H, W] channel plane VMEM-
resident per grid step and compute all five pooled statistics in a single
pass; the backward applies the closed-form adjoint (the 1/9 zero-padded
box filter is self-adjoint, so pool^T == pool).

Semantics preserved exactly from ops/ssim.py (the reference's
pytorch_ssim/ssim.py:4-19): 3x3 average pool with stride 1, zero padding,
constant 1/9 divisor (torch AvgPool2d count_include_pad), C1=0.01^2,
C2=0.03^2; statistics in f32 regardless of input dtype (bf16 variances
catastrophically cancel -- see the ssim.py NaN note), output cast back.

Math for the backward, with P1..P5 = pool(x), pool(y), pool(x^2),
pool(y^2), pool(xy):

    A  = 2 (P5 - P1 P2) + C2       N = B1 A      s = N / D
    B1 = 2 P1 P2 + C1              D = E  C
    C  = (P3 - P1^2) + (P4 - P2^2) + C2
    E  = P1^2 + P2^2 + C1

    u = g / D,  v = -g N / D^2     (g = ds cotangent)
    dP1 = 2 P2 u (A - B1) + 2 P1 v (C - E)
    dP2 = 2 P1 u (A - B1) + 2 P2 v (C - E)
    dP3 = dP4 = v E,   dP5 = 2 u B1
    dx = pool(dP1) + 2x pool(vE) + y pool(2uB1)
    dy = pool(dP2) + 2y pool(vE) + x pool(2uB1)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C1 = 0.01**2
_C2 = 0.03**2

# v5e VMEM ~16 MiB/core; per-channel planes at 256x832 f32 are ~0.85 MB so
# the working sets below stay well inside this.
_VMEM_BUDGET = 12 * 1024 * 1024

# Off-TPU the public entries fall back to the XLA formulation; kernel unit
# tests flip this to run the kernels under the interpreter.
_FORCE_INTERPRET = False


def _pool_into(acc, xpad, tmp, h, w):
    """acc[:h,:w] = 3x3 zero-padded box sum of the plane whose padded copy
    is xpad [h+2, w+2], via separable row+col passes; constant 1/9 applied
    by callers. tmp is [h+2, w] scratch."""
    tmp[:] = xpad[:, 0:w] + xpad[:, 1 : w + 1] + xpad[:, 2 : w + 2]
    acc[:] = tmp[0:h] + tmp[1 : h + 1] + tmp[2 : h + 2]


def _fwd_kernel(x_ref, y_ref, s_ref, xp, yp, p1, p2, p3, p4, p5, tmp, *, h, w):
    ninth = jnp.asarray(1.0 / 9.0, jnp.float32)
    x = x_ref[0, 0].astype(jnp.float32)
    y = y_ref[0, 0].astype(jnp.float32)
    xp[:] = jnp.zeros_like(xp)
    yp[:] = jnp.zeros_like(yp)
    xp[1 : h + 1, 1 : w + 1] = x
    yp[1 : h + 1, 1 : w + 1] = y
    _pool_into(p1, xp, tmp, h, w)
    _pool_into(p2, yp, tmp, h, w)
    # reuse xp/yp slots for the squared/cross planes
    xp[1 : h + 1, 1 : w + 1] = x * x
    _pool_into(p3, xp, tmp, h, w)
    xp[1 : h + 1, 1 : w + 1] = x * y
    _pool_into(p5, xp, tmp, h, w)
    yp[1 : h + 1, 1 : w + 1] = y * y
    _pool_into(p4, yp, tmp, h, w)

    m1 = p1[:] * ninth
    m2 = p2[:] * ninth
    sx = p3[:] * ninth - m1 * m1
    sy = p4[:] * ninth - m2 * m2
    sxy = p5[:] * ninth - m1 * m2
    num = (2.0 * m1 * m2 + _C1) * (2.0 * sxy + _C2)
    den = (m1 * m1 + m2 * m2 + _C1) * (sx + sy + _C2)
    s_ref[0, 0] = (num / den).astype(s_ref.dtype)


def _bwd_kernel(
    x_ref, y_ref, g_ref, dx_ref, dy_ref,
    xp, yp, p1, p2, f3, f5, tmp, *, h, w
):
    ninth = jnp.asarray(1.0 / 9.0, jnp.float32)
    x = x_ref[0, 0].astype(jnp.float32)
    y = y_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)
    xp[:] = jnp.zeros_like(xp)
    yp[:] = jnp.zeros_like(yp)
    xp[1 : h + 1, 1 : w + 1] = x
    yp[1 : h + 1, 1 : w + 1] = y
    _pool_into(p1, xp, tmp, h, w)
    _pool_into(p2, yp, tmp, h, w)
    xp[1 : h + 1, 1 : w + 1] = x * x
    _pool_into(f3, xp, tmp, h, w)
    yp[1 : h + 1, 1 : w + 1] = y * y
    _pool_into(f5, yp, tmp, h, w)
    m1 = p1[:] * ninth
    m2 = p2[:] * ninth
    sx = f3[:] * ninth - m1 * m1
    sy = f5[:] * ninth - m2 * m2
    xp[1 : h + 1, 1 : w + 1] = x * y
    _pool_into(f3, xp, tmp, h, w)
    sxy = f3[:] * ninth - m1 * m2

    a = 2.0 * sxy + _C2
    b1 = 2.0 * m1 * m2 + _C1
    cc = sx + sy + _C2
    e = m1 * m1 + m2 * m2 + _C1
    n = b1 * a
    d = e * cc
    u = g / d
    v = -g * n / (d * d)
    gab = u * (a - b1)
    hce = v * (cc - e)
    # dP1 / dP2 planes (write into p1/p2 slots -- m1/m2 no longer needed
    # after these two lines)
    p1[:] = 2.0 * m2 * gab + 2.0 * m1 * hce
    p2[:] = 2.0 * m1 * gab + 2.0 * m2 * hce
    f3[:] = v * e          # dP3 == dP4 plane
    f5[:] = 2.0 * u * b1   # dP5 plane

    # pool^T == pool (constant 1/9, zero pad): pad each cotangent plane and
    # box-sum it. The extra 1/9 from the forward's divisor is already inside
    # the dP planes? No: P_i fed the elementwise chain as pool_sum * 1/9, so
    # d(chain)/d(pool_sum) = dP * 1/9, and pool^T of that spreads another
    # constant-1 box sum -- net: pool(dP)*1/9 = avg3x3(dP). Apply ninth after
    # the box sum below.
    xp[:] = jnp.zeros_like(xp)
    xp[1 : h + 1, 1 : w + 1] = p1[:]
    _pool_into(p1, xp, tmp, h, w)
    xp[1 : h + 1, 1 : w + 1] = p2[:]  # note: pad ring stays zero
    _pool_into(p2, xp, tmp, h, w)
    xp[1 : h + 1, 1 : w + 1] = f3[:]
    _pool_into(f3, xp, tmp, h, w)
    xp[1 : h + 1, 1 : w + 1] = f5[:]
    _pool_into(f5, xp, tmp, h, w)

    dx_ref[0, 0] = (
        (p1[:] + 2.0 * x * f3[:] + y * f5[:]) * ninth
    ).astype(dx_ref.dtype)
    dy_ref[0, 0] = (
        (p2[:] + 2.0 * y * f3[:] + x * f5[:]) * ninth
    ).astype(dy_ref.dtype)


def _plane_specs(h, w, n_in, n_out):
    spec = pl.BlockSpec(
        (1, 1, h, w), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM
    )
    return [spec] * n_in, [spec] * n_out if n_out > 1 else spec


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ssim_fwd_pallas(xc, yc, interpret: bool):
    b, c, h, w = xc.shape
    in_specs, out_spec = _plane_specs(h, w, 2, 1)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), xc.dtype),
        grid=(b, c),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2), f32),  # xp
            pltpu.VMEM((h + 2, w + 2), f32),  # yp
            pltpu.VMEM((h, w), f32),  # p1
            pltpu.VMEM((h, w), f32),  # p2
            pltpu.VMEM((h, w), f32),  # p3
            pltpu.VMEM((h, w), f32),  # p4
            pltpu.VMEM((h, w), f32),  # p5
            pltpu.VMEM((h + 2, w), f32),  # tmp
        ],
        interpret=interpret,
    )(xc, yc)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ssim_bwd_pallas(xc, yc, gc, interpret: bool):
    b, c, h, w = xc.shape
    in_specs, out_specs = _plane_specs(h, w, 3, 2)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w),
        out_shape=(
            jax.ShapeDtypeStruct((b, c, h, w), xc.dtype),
            jax.ShapeDtypeStruct((b, c, h, w), xc.dtype),
        ),
        grid=(b, c),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2), f32),  # xp
            pltpu.VMEM((h + 2, w + 2), f32),  # yp
            pltpu.VMEM((h, w), f32),  # p1
            pltpu.VMEM((h, w), f32),  # p2
            pltpu.VMEM((h, w), f32),  # f3
            pltpu.VMEM((h, w), f32),  # f5
            pltpu.VMEM((h + 2, w), f32),  # tmp
        ],
        interpret=interpret,
    )(xc, yc, gc)


def _vmem_bytes(h, w):
    def padded_lanes(lanes):
        return -(-lanes // 128) * 128

    plane = h * padded_lanes(w) * 4
    pad_plane = (h + 2) * padded_lanes(w + 2) * 4
    return 2 * pad_plane + 5 * plane + (h + 2) * padded_lanes(w) * 4


def ssim_fits(h, w) -> bool:
    return _vmem_bytes(h, w) <= _VMEM_BUDGET


def _use_kernel(shape) -> bool:
    b, h, w, c = shape
    if h * w < 1024 or not ssim_fits(h, w):
        return False
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    return on_tpu or _FORCE_INTERPRET


def _nchw(t):
    return jnp.transpose(t, (0, 3, 1, 2))


def _nhwc(t):
    return jnp.transpose(t, (0, 2, 3, 1))


@jax.custom_vjp
def ssim_fused(x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-pixel SSIM map of two NHWC images (drop-in for ops.ssim.ssim)."""
    if not _use_kernel(x.shape):
        from ..ssim import ssim_xla

        return ssim_xla(x, y)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    return _nhwc(_ssim_fwd_pallas(_nchw(x), _nchw(y), not on_tpu))


def _fused_fwd(x, y):
    return ssim_fused(x, y), (x, y)


def _fused_bwd(res, g):
    x, y = res
    if not _use_kernel(x.shape):
        from ..ssim import ssim_xla

        _, vjp = jax.vjp(ssim_xla, x, y)
        return vjp(g)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    dx, dy = _ssim_bwd_pallas(
        _nchw(x), _nchw(y), _nchw(g.astype(x.dtype)), not on_tpu
    )
    return _nhwc(dx), _nhwc(dy)


ssim_fused.defvjp(_fused_fwd, _fused_bwd)
