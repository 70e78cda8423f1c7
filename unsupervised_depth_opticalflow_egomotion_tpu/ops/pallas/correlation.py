"""Pallas TPU kernel: PWC correlation cost volume.

The XLA formulation (ops/cost_volume.py) emits 81 shifted elementwise
products; XLA fuses them but can re-read the padded feature map from HBM per
shift when the fusion is bandwidth-bound. This kernel keeps one (f1, padded
f2) image pair resident in VMEM and produces all 81 correlation planes from
it, so f2 is read from HBM exactly once.

Grid: (B,). Blocks: whole feature maps -- at PWC's correlation resolutions
(1/4 scale and below of a 256x832 input) f1 + padded f2 + the 81-plane output
total well under the ~16 MB VMEM budget. All shifts are static slices, so
Mosaic lowers the body to an unrolled VPU multiply-reduce chain over VMEM.
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

    # fori_loop over the shift grid keeps the Mosaic program small (the fully
    # unrolled 81-slice version compiles for minutes)
    def body(k, _):
        i = k // n
        j = k % n
        shifted = f2p_ref[0, pl.ds(i, h), pl.ds(j, w), :]
        out_ref[0, :, :, k] = jnp.sum(f1 * shifted, axis=-1) * inv_c
        return 0

    jax.lax.fori_loop(0, n * n, body, 0)


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

    return pl.pallas_call(
        functools.partial(_corr_kernel, md=d, h=h, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((b, h, w, n * n), f1.dtype),
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
            (1, h, w, n * n), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(f1, f2p)
