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

# v5e scoped VMEM limit is 16 MiB/core; _vmem_bytes estimates the bwd
# working set (~13.1 MB at 256x832) and planes must fit under this with a
# 1 MiB safety margin for Mosaic's own bookkeeping.
_VMEM_BUDGET = 15 * 1024 * 1024

# Off-TPU the public entries fall back to the XLA formulation; kernel unit
# tests flip this to run the kernels under the interpreter.
_FORCE_INTERPRET = False


def _pool_into(acc, xpad, tmp, h, w):
    """acc[:h,:w] = 3x3 zero-padded box sum of the plane whose padded copy
    is xpad [h+2, w+2], via separable row+col passes; constant 1/9 applied
    by callers. tmp is [h+2, w] scratch."""
    tmp[:] = xpad[:, 0:w] + xpad[:, 1 : w + 1] + xpad[:, 2 : w + 2]
    acc[:] = tmp[0:h] + tmp[1 : h + 1] + tmp[2 : h + 2]


def _fwd_kernel(x_ref, y_ref, s_ref, xp, p1, p2, p3, p4, tmp, *, h, w):
    # Mosaic stack-allocates whole-plane temporaries per statement, so the
    # computation is staged through a fixed set of scratch planes with short
    # expressions (peak VMEM is what gates full-res use of these kernels).
    ninth = jnp.asarray(1.0 / 9.0, jnp.float32)
    xp[:] = jnp.zeros_like(xp)  # pad ring stays zero across all five pools
    xp[1 : h + 1, 1 : w + 1] = x_ref[0, 0].astype(jnp.float32)
    _pool_into(p1, xp, tmp, h, w)
    p1[:] = p1[:] * ninth  # m1
    xp[1 : h + 1, 1 : w + 1] = y_ref[0, 0].astype(jnp.float32)
    _pool_into(p2, xp, tmp, h, w)
    p2[:] = p2[:] * ninth  # m2
    xp[1 : h + 1, 1 : w + 1] = (
        x_ref[0, 0].astype(jnp.float32) * x_ref[0, 0].astype(jnp.float32)
    )
    _pool_into(p3, xp, tmp, h, w)
    p3[:] = p3[:] * ninth - p1[:] * p1[:]  # sx
    xp[1 : h + 1, 1 : w + 1] = (
        y_ref[0, 0].astype(jnp.float32) * y_ref[0, 0].astype(jnp.float32)
    )
    _pool_into(p4, xp, tmp, h, w)
    p3[:] = p3[:] + (p4[:] * ninth - p2[:] * p2[:]) + _C2  # sx + sy + C2
    xp[1 : h + 1, 1 : w + 1] = (
        x_ref[0, 0].astype(jnp.float32) * y_ref[0, 0].astype(jnp.float32)
    )
    _pool_into(p4, xp, tmp, h, w)
    p4[:] = 2.0 * (p4[:] * ninth - p1[:] * p2[:]) + _C2  # 2 sxy + C2
    p4[:] = p4[:] * (2.0 * p1[:] * p2[:] + _C1)  # num
    p3[:] = p3[:] * (p1[:] * p1[:] + p2[:] * p2[:] + _C1)  # den
    s_ref[0, 0] = (p4[:] / p3[:]).astype(s_ref.dtype)


def _bwd_kernel(
    x_ref, y_ref, g_ref, dx_ref, dy_ref,
    xp, q1, q2, q3, q4, q5, q6, tmp, *, h, w
):
    # Staged like _fwd_kernel: one shared pad buffer, short expressions, all
    # intermediates confined to the six [h, w] scratch planes (plus the two
    # transient u/v planes) so Mosaic's per-statement stack stays bounded.
    ninth = jnp.asarray(1.0 / 9.0, jnp.float32)
    xp[:] = jnp.zeros_like(xp)  # pad ring stays zero across all pools
    xp[1 : h + 1, 1 : w + 1] = x_ref[0, 0].astype(jnp.float32)
    _pool_into(q1, xp, tmp, h, w)
    q1[:] = q1[:] * ninth  # m1
    xp[1 : h + 1, 1 : w + 1] = y_ref[0, 0].astype(jnp.float32)
    _pool_into(q2, xp, tmp, h, w)
    q2[:] = q2[:] * ninth  # m2
    xp[1 : h + 1, 1 : w + 1] = (
        x_ref[0, 0].astype(jnp.float32) * x_ref[0, 0].astype(jnp.float32)
    )
    _pool_into(q3, xp, tmp, h, w)
    q3[:] = q3[:] * ninth - q1[:] * q1[:]  # sx
    xp[1 : h + 1, 1 : w + 1] = (
        y_ref[0, 0].astype(jnp.float32) * y_ref[0, 0].astype(jnp.float32)
    )
    _pool_into(q4, xp, tmp, h, w)
    q3[:] = q3[:] + (q4[:] * ninth - q2[:] * q2[:]) + _C2  # cc = sx + sy + C2
    xp[1 : h + 1, 1 : w + 1] = (
        x_ref[0, 0].astype(jnp.float32) * y_ref[0, 0].astype(jnp.float32)
    )
    _pool_into(q4, xp, tmp, h, w)
    q4[:] = 2.0 * (q4[:] * ninth - q1[:] * q2[:]) + _C2  # a = 2 sxy + C2
    q5[:] = 2.0 * q1[:] * q2[:] + _C1  # b1
    q6[:] = q1[:] * q1[:] + q2[:] * q2[:] + _C1  # e

    # u = g / (e cc) lives in tmp[0:h] (tmp is free between pools); the four
    # cotangent products then overwrite the stats in dependency order --
    # each target slot is the last consumer of its old value:
    #   hce = v (cc - e) -> q6   (only hce reads e beyond this point)
    #   vE  = -u b1 a / cc -> q3 (v e with the e cc cancellation; cc dies)
    #   gab = u (a - b1)  -> q4
    #   dP5 = 2 u b1      -> q5
    tmp[0:h] = g_ref[0, 0].astype(jnp.float32) / (q6[:] * q3[:])  # u
    q6[:] = (-tmp[0:h] * (q5[:] * q4[:]) / (q6[:] * q3[:])) * (q3[:] - q6[:])
    q3[:] = -tmp[0:h] * (q5[:] * q4[:]) / q3[:]  # vE
    q4[:] = tmp[0:h] * (q4[:] - q5[:])  # gab
    q5[:] = 2.0 * tmp[0:h] * q5[:]  # dP5

    # dP1 = 2 m2 gab + 2 m1 hce; dP2 = 2 m1 gab + 2 m2 hce
    tmp[0:h] = 2.0 * q1[:] * q4[:] + 2.0 * q2[:] * q6[:]  # dP2 stash
    q1[:] = 2.0 * q2[:] * q4[:] + 2.0 * q1[:] * q6[:]  # dP1 (self-assign ok)
    q2[:] = tmp[0:h]  # dP2

    # pool^T == pool (constant 1/9 zero-padded box filter is self-adjoint):
    # box-sum each cotangent plane; the forward's 1/9 divisor surfaces as
    # one `ninth` on the pooled planes at the end.
    xp[:] = jnp.zeros_like(xp)
    xp[1 : h + 1, 1 : w + 1] = q1[:]
    _pool_into(q1, xp, tmp, h, w)
    xp[1 : h + 1, 1 : w + 1] = q2[:]  # pad ring stays zero
    _pool_into(q2, xp, tmp, h, w)
    xp[1 : h + 1, 1 : w + 1] = q3[:]
    _pool_into(q3, xp, tmp, h, w)
    xp[1 : h + 1, 1 : w + 1] = q5[:]
    _pool_into(q5, xp, tmp, h, w)

    dx_ref[0, 0] = (
        (
            q1[:]
            + 2.0 * x_ref[0, 0].astype(jnp.float32) * q3[:]
            + y_ref[0, 0].astype(jnp.float32) * q5[:]
        )
        * ninth
    ).astype(dx_ref.dtype)
    dy_ref[0, 0] = (
        (
            q2[:]
            + 2.0 * y_ref[0, 0].astype(jnp.float32) * q3[:]
            + x_ref[0, 0].astype(jnp.float32) * q5[:]
        )
        * ninth
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
            pltpu.VMEM((h + 2, w + 2), f32),  # xp (shared pad buffer)
            pltpu.VMEM((h, w), f32),  # p1
            pltpu.VMEM((h, w), f32),  # p2
            pltpu.VMEM((h, w), f32),  # p3
            pltpu.VMEM((h, w), f32),  # p4
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
            pltpu.VMEM((h + 2, w + 2), f32),  # xp (shared pad buffer)
            pltpu.VMEM((h, w), f32),  # q1
            pltpu.VMEM((h, w), f32),  # q2
            pltpu.VMEM((h, w), f32),  # q3
            pltpu.VMEM((h, w), f32),  # q4
            pltpu.VMEM((h, w), f32),  # q5
            pltpu.VMEM((h, w), f32),  # q6
            pltpu.VMEM((h + 2, w), f32),  # tmp
        ],
        interpret=interpret,
    )(xc, yc, gc)


def _vmem_bytes(h, w):
    """Worst-case (bwd) working set: shared pad buffer + six scratch planes
    + tmp + double-buffered bf16 in/out blocks + ~2 planes of Mosaic
    statement temporaries (the closed-form hce expression's live set)."""

    def padded_lanes(lanes):
        return -(-lanes // 128) * 128

    plane = h * padded_lanes(w) * 4
    pad_plane = (h + 2) * padded_lanes(w + 2) * 4
    block_bf16 = h * padded_lanes(w) * 2
    return (
        pad_plane
        + 6 * plane
        + (h + 2) * padded_lanes(w) * 4
        + 2 * 5 * block_bf16
        + 2 * plane
    )


def ssim_fits(h, w) -> bool:
    return _vmem_bytes(h, w) <= _VMEM_BUDGET


def _use_kernel(shape) -> bool:
    b, h, w, c = shape
    # Hardware measurements (scripts/bench_ssim_fused.py, v5e-class chip):
    # the kernel wins 3.98 -> 2.28 ms fwd+bwd at 256x832 and ties at
    # 128x416; below that the XLA form's fusions win, so only large planes
    # route to the kernel.
    if h * w < 50_000 or not ssim_fits(h, w):
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
