"""Fused Pallas TPU kernels for the PWC correlation cost volume (fwd + bwd).

Round-3 redesign of the correlation path. The XLA formulation
(ops/cost_volume.py) builds the [B,H,W,81] output by stacking 81 single-
channel planes -- on hardware that materializes as an 81-operand concatenate
(8.5 ms/step at the 64x208x32 level) plus 81 per-plane layout copies feeding
both the decoder concat and the autodiff backward (7.3 ms), and the autodiff
backward itself accumulates df1/df2 through 81 sliced copies
(multiply_add_fusion at 4 GB/s, 14.6 ms). These kernels keep everything
VMEM-resident per batch item and read/write whole [81,H,W] tensors.

Layout: per batch item the kernels run on channel-major blocks --
f [C,H,W] (H on sublanes, W on lanes) and cost volume [81,H,W] -- so the
small channel counts (C=32..196) never pad the 128-lane axis the way NHWC
[H,W,C] blocks do (C=32 padded to 128 lanes was exactly why the round-2
NHWC kernel blew VMEM at the 64x208x32 level). The 81 window shifts are
statically unrolled; shifted reads are static sublane/lane slices, which
Mosaic lowers to cheap vreg rotations.

The public entry (``correlation_fused``) is NHWC in / NHWC out with a custom
VJP; transposes at the boundary cost ~bandwidth and buy a single-tensor
[B,H,W,81] output (the PWC decoder concat drops from 83 operands to 3).

Reference semantics preserved: zero padding outside f2, row-major (i,j)
shift order, channel-mean (pwc_tf.py:97-106).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(f1_ref, f2p_ref, out_ref, *, md: int, h: int, w: int, c: int):
    """out[d, y, x] = (1/C) sum_c f1[c, y, x] * f2p[c, y+i, x+j], d=(i,j)."""
    f1 = f1_ref[0]  # [C, H, W]
    inv_c = jnp.asarray(1.0 / c, jnp.float32)
    n = 2 * md + 1
    for i in range(n):
        for j in range(n):
            shifted = f2p_ref[0, :, i : i + h, j : j + w]
            prod = (f1 * shifted).astype(jnp.float32)
            out_ref[0, i * n + j] = (jnp.sum(prod, axis=0) * inv_c).astype(
                out_ref.dtype
            )


def _bwd_df1_kernel(g_ref, f2p_ref, df1_ref, acc, *, md: int, h: int, w: int, c: int):
    """df1[c, y, x] = (1/C) sum_d g[d, y, x] * f2p[c, y+i, x+j]."""
    inv_c = jnp.asarray(1.0 / c, jnp.float32)
    n = 2 * md + 1
    acc[:] = jnp.zeros_like(acc)
    for i in range(n):
        for j in range(n):
            g = g_ref[0, i * n + j].astype(jnp.float32)  # [H, W]
            shifted = f2p_ref[0, :, i : i + h, j : j + w].astype(jnp.float32)
            acc[:] = acc[:] + g[None] * shifted
    df1_ref[0] = (acc[:] * inv_c).astype(df1_ref.dtype)


def _bwd_df2_kernel(g_ref, f1_ref, df2_ref, acc, *, md: int, h: int, w: int, c: int):
    """df2p[c, y+i, x+j] += (1/C) g[d, y, x] * f1[c, y, x]; df2 = center crop."""
    inv_c = jnp.asarray(1.0 / c, jnp.float32)
    n = 2 * md + 1
    f1 = f1_ref[0].astype(jnp.float32)  # [C, H, W]
    acc[:] = jnp.zeros_like(acc)
    for i in range(n):
        for j in range(n):
            g = g_ref[0, i * n + j].astype(jnp.float32)  # [H, W]
            acc[:, i : i + h, j : j + w] = acc[:, i : i + h, j : j + w] + g[None] * f1
    df2_ref[0] = (acc[:, md : md + h, md : md + w] * inv_c).astype(df2_ref.dtype)


def _nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def _nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


@functools.partial(jax.jit, static_argnames=("md", "interpret"))
def _corr_fwd_pallas(f1c, f2c, md: int, interpret: bool):
    b, c, h, w = f1c.shape
    d = md
    n = 2 * d + 1
    f2p = jnp.pad(f2c, ((0, 0), (0, 0), (d, d), (d, d)))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, md=d, h=h, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((b, n * n, h, w), f1c.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, c, h + 2 * d, w + 2 * d),
                lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n * n, h, w), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(f1c, f2p)


@functools.partial(jax.jit, static_argnames=("md", "interpret"))
def _corr_bwd_pallas(g, f1c, f2c, md: int, interpret: bool):
    b, c, h, w = f1c.shape
    d = md
    n = 2 * d + 1
    f2p = jnp.pad(f2c, ((0, 0), (0, 0), (d, d), (d, d)))
    df1 = pl.pallas_call(
        functools.partial(_bwd_df1_kernel, md=d, h=h, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), f1c.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, n * n, h, w), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, c, h + 2 * d, w + 2 * d),
                lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, h, w), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((c, h, w), jnp.float32)],
        interpret=interpret,
    )(g, f2p)
    df2 = pl.pallas_call(
        functools.partial(_bwd_df2_kernel, md=d, h=h, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), f1c.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, n * n, h, w), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, c, h, w), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, h, w), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((c, h + 2 * d, w + 2 * d), jnp.float32)],
        interpret=interpret,
    )(g, f1c)
    return df1, df2


def _vmem_bytes_fwd(c, h, w, d, itemsize):
    n = 2 * d + 1

    def padded(rows, lanes):
        return rows * -(-lanes // 128) * 128

    f1 = c * padded(h, w)
    f2p = c * padded(h + 2 * d, w + 2 * d)
    out = n * n * padded(h, w)
    acc_f32 = c * padded(h + 2 * d, w + 2 * d) * 2  # f32 scratch vs bf16 items
    # double buffering on in/out blocks + the largest scratch
    return (2 * (f1 + f2p + out) + acc_f32) * itemsize


# v5e VMEM is ~16 MiB/core; leave headroom for Mosaic's own buffers.
_VMEM_BUDGET = 12 * 1024 * 1024

# Off-TPU the kernels fall back to the XLA formulation (same math; CPU/GPU
# tests should not pay interpret-mode cost in every model test). The kernel
# unit tests flip this to exercise the kernel code path via the interpreter.
_FORCE_INTERPRET = False


def fused_fits(shape_nhwc, md: int = 4, dtype=jnp.bfloat16) -> bool:
    _, h, w, c = shape_nhwc
    return _vmem_bytes_fwd(c, h, w, md, jnp.dtype(dtype).itemsize) <= _VMEM_BUDGET


def _use_kernel(shape, md, dtype) -> bool:
    if not fused_fits(shape, md, dtype):
        return False
    # Tiny levels lose to the XLA formulation (hardware-measured at
    # 16x4x13x196: fwd 1.05 -> 2.00 ms -- the per-item grid launch dominates
    # a 52-pixel level); scripts/bench_corr_fused.py.
    if shape[1] * shape[2] < 128:
        return False
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    return on_tpu or _FORCE_INTERPRET


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def correlation_fused(f1: jax.Array, f2: jax.Array, md: int = 4) -> jax.Array:
    """NHWC cost volume [B,H,W,(2md+1)^2] with fused Pallas fwd/bwd kernels.

    Falls back to the fused-XLA formulation (ops/cost_volume.py) on levels
    whose working set exceeds the VMEM budget (none of the standard PWC
    levels do) and off-TPU (CPU tests get the same math without interpreter
    cost; the kernel unit tests force interpret mode via _FORCE_INTERPRET).
    """
    if not _use_kernel(f1.shape, md, f1.dtype):
        from ..cost_volume import correlation

        return correlation(f1, f2, md)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    out = _corr_fwd_pallas(_nchw(f1), _nchw(f2), md, not on_tpu)
    return _nhwc(out)


def _fused_fwd(f1, f2, md):
    return correlation_fused(f1, f2, md), (f1, f2)


def _fused_bwd(md, res, g):
    f1, f2 = res
    if not _use_kernel(f1.shape, md, f1.dtype):
        # mirror the forward's fallback: differentiate the XLA formulation
        from ..cost_volume import correlation

        _, vjp = jax.vjp(lambda a, b: correlation(a, b, md), f1, f2)
        return vjp(g)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    df1, df2 = _corr_bwd_pallas(
        _nchw(g.astype(f1.dtype)), _nchw(f1), _nchw(f2), md, not on_tpu
    )
    return _nhwc(df1), _nhwc(df2)


correlation_fused.defvjp(_fused_fwd, _fused_bwd)
