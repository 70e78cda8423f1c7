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
