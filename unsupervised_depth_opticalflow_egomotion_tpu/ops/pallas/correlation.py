"""Pallas TPU kernel: PWC correlation cost volume.

The XLA formulation (ops/cost_volume.py) emits 81 shifted elementwise
products which XLA fuses well (measured ~4 ms for a 16x64x208x32 bf16 level on
v5e, near the VPU flop bound) -- it is the default. This kernel is the
VMEM-resident alternative: one (f1, padded f2) pair stays in VMEM and all 81
correlation planes are produced from it, so f2 is read from HBM exactly once.

Mosaic constraints shape the layout:
- the vertical shift loop is a ``fori_loop`` over the *untiled* H dim
  (dynamic starts on the tiled sublane/lane dims must be provably aligned)
- horizontal shifts are statically unrolled
- the kernel writes channels-second [B, 81, H, W] (dynamic shift index lands
  on an untiled dim) and the caller transposes back to NHWC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(f1_ref, f2p_ref, out_ref, *, md: int, h: int, w: int, c: int):
    f1 = f1_ref[0]  # [H, W, C]
    inv_c = jnp.asarray(1.0 / c, f1_ref.dtype)
    n = 2 * md + 1

    def body(i, _):
        # dynamic vertical shift on the untiled H dim; horizontal shifts
        # statically unrolled
        for j in range(n):
            shifted = f2p_ref[0, pl.ds(i, h), j : j + w, :]
            out_ref[0, i * n + j, :, :] = jnp.sum(f1 * shifted, axis=-1) * inv_c
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("md", "interpret"))
def correlation_pallas(
    f1: jax.Array,
    f2: jax.Array,
    md: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Cost volume [B,H,W,(2*md+1)^2] between NHWC feature maps.

    Matches ops.cost_volume.correlation (zero padding, row-major shift order,
    channel-mean) as a single VMEM-resident Pallas kernel per batch item.
    """
    assert f1.shape == f2.shape
    b, h, w, c = f1.shape
    d = md
    n = 2 * d + 1
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_corr_kernel, md=d, h=h, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((b, n * n, h, w), f1.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, h + 2 * d, w + 2 * d, c),
                lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n * n, h, w), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(f1, f2p)
    return jnp.transpose(out, (0, 2, 3, 1))


# Largest per-batch-item working set (bytes) the kernel is allowed; above
# this the v5e Mosaic compile fails (observed at the 64x208x32 bf16 level:
# ~1.5M elements x 2 bytes), so correlation_vjp falls back to the fused-XLA
# formulation there. Expressed in bytes so an f32 run halves the element
# budget instead of overrunning VMEM at compile time.
_VMEM_BYTE_BOUND = 3_000_000


def pallas_fits(shape, md: int = 4, dtype=jnp.bfloat16) -> bool:
    """Whether the kernel's VMEM working set fits for a [B,H,W,C] level."""
    _, h, w, c = shape
    n = 2 * md + 1
    elems = (h + 2 * md) * (w + 2 * md) * c + n * n * h * w + h * w * c
    return elems * jnp.dtype(dtype).itemsize <= _VMEM_BYTE_BOUND


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def correlation_vjp(f1: jax.Array, f2: jax.Array, md: int = 4) -> jax.Array:
    """Trainable wrapper: Pallas forward (XLA fallback where the kernel does
    not fit VMEM), XLA-formulation backward.

    Hardware measurements (scripts/bench_corr.py, v5e, b16 levels of the geom
    step): the kernel matches the XLA form numerically on every level it
    compiles for, and wins only at 16x52x96 (2.77 -> 1.54 ms fwd); the XLA
    form stays the default (Config.pwc_corr = "xla").
    """
    if pallas_fits(f1.shape, md):
        # interpret off-TPU so the CPU test mesh / CI can trace this path
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        return correlation_pallas(f1, f2, md, interpret=not on_tpu)
    from ..cost_volume import correlation

    return correlation(f1, f2, md)


def _corr_fwd(f1, f2, md):
    return correlation_vjp(f1, f2, md), (f1, f2)


def _corr_bwd(md, res, g):
    # d corr / d f1 and d f2 via the same 81-shift structure as the forward
    # (ops/cost_volume.py): df1 = sum_ij g_ij * shift_ij(f2) / C,
    # df2 = sum_ij unshift_ij(g_ij * f1) / C.
    f1, f2 = res
    b, h, w, c = f1.shape
    d = md
    n = 2 * d + 1
    inv_c = jnp.asarray(1.0 / c, f1.dtype)
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    df1 = jnp.zeros_like(f1)
    df2p = jnp.zeros_like(f2p)
    for i in range(n):
        for j in range(n):
            gij = g[..., i * n + j : i * n + j + 1] * inv_c
            shifted = jax.lax.dynamic_slice(f2p, (0, i, j, 0), (b, h, w, c))
            df1 = df1 + gij * shifted
            df2p = jax.lax.dynamic_update_slice(
                df2p,
                jax.lax.dynamic_slice(df2p, (0, i, j, 0), (b, h, w, c)) + gij * f1,
                (0, i, j, 0),
            )
    df2 = df2p[:, d : d + h, d : d + w]
    return df1, df2


correlation_vjp.defvjp(_corr_fwd, _corr_bwd)
