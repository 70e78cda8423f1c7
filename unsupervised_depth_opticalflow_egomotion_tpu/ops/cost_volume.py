"""Correlation cost volume for PWC-style flow decoding (NHWC).

The reference computes this as 81 shifted elementwise products in a Python
loop over torch ops (/root/reference/core/networks/structures/pwc_tf.py:97-106).
Here the 81 shifts are generated at trace time from one zero-padded feature
map; XLA fuses the whole stack of multiply+channel-mean ops into a handful of
VPU loops over VMEM-resident tiles, so there is no materialized
[B,H,W,C,81] intermediate. A Pallas kernel (ops/pallas/correlation.py) covers
the cases where the fused XLA form is still bandwidth-bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def correlation(f1: jax.Array, f2: jax.Array, md: int = 4) -> jax.Array:
    """Cost volume between two feature maps [B,H,W,C] -> [B,H,W,(2*md+1)^2].

    Entry (i, j) of the last dim is mean_c f1[y, x, c] * f2[y + i - md,
    x + j - md, c] with zero padding outside f2, matching the reference's
    channel ordering (row-major over (i, j), pwc_tf.py:103-106).
    """
    assert f1.shape == f2.shape
    b, h, w, c = f1.shape
    d = md
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    inv_c = jnp.asarray(1.0 / c, f1.dtype)
    cv = []
    for i in range(2 * d + 1):
        for j in range(2 * d + 1):
            shifted = jax.lax.dynamic_slice(f2p, (0, i, j, 0), (b, h, w, c))
            cv.append(jnp.sum(f1 * shifted, axis=-1) * inv_c)
    return jnp.stack(cv, axis=-1)
