"""Validate + time the fused Pallas correlation kernels on real TPU.

Compares correlation_fused (Pallas fwd+bwd) against the XLA formulation at
every live PWC level shape (b8 256x832 run), checking forward values and
gradients, then times fwd and fwd+bwd for both implementations.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from unsupervised_depth_opticalflow_egomotion_tpu.ops.cost_volume import correlation
from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas.correlation_fused import (
    correlation_fused,
    fused_fits,
)

# [B,H,W,C] feature-level shapes for batch 8 at 256x832 (feature pyramid
# channel plan 16..196, PWC correlates levels 6..2)
LEVELS = [
    (16, 4, 13, 196),
    (16, 8, 26, 128),
    (16, 16, 52, 96),
    (16, 32, 104, 64),
    (16, 64, 208, 32),
]


def timeit(fn, *args, iters=30):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else None
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("backend:", jax.default_backend())
    dtype = jnp.bfloat16
    total_x, total_p = 0.0, 0.0
    for shape in LEVELS:
        rng = np.random.RandomState(0)
        f1 = jnp.asarray(rng.randn(*shape).astype(np.float32), dtype)
        f2 = jnp.asarray(rng.randn(*shape).astype(np.float32), dtype)
        cot = jnp.asarray(rng.randn(shape[0], shape[1], shape[2], 81), dtype)

        # correctness
        want = np.asarray(correlation(f1, f2, 4), np.float32)
        got = np.asarray(correlation_fused(f1, f2, 4), np.float32)
        err = np.abs(got - want).max()

        def loss_x(a, b):
            return jnp.sum((correlation(a, b, 4) * cot).astype(jnp.float32))

        def loss_p(a, b):
            return jnp.sum((correlation_fused(a, b, 4) * cot).astype(jnp.float32))

        gx = jax.jit(jax.grad(loss_x, argnums=(0, 1)))
        gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))
        d1x, d2x = gx(f1, f2)
        d1p, d2p = gp(f1, f2)
        gerr = max(
            np.abs(np.asarray(d1p, np.float32) - np.asarray(d1x, np.float32)).max(),
            np.abs(np.asarray(d2p, np.float32) - np.asarray(d2x, np.float32)).max(),
        )

        fx = timeit(jax.jit(lambda a, b: correlation(a, b, 4)), f1, f2)
        fp = timeit(jax.jit(lambda a, b: correlation_fused(a, b, 4)), f1, f2)
        bx = timeit(gx, f1, f2)
        bp = timeit(gp, f1, f2)
        total_x += fx + bx
        total_p += fp + bp
        print(
            f"{str(shape):>20} fits={fused_fits(shape)} err={err:.4f} gerr={gerr:.4f} "
            f"fwd xla {fx:6.2f}ms pallas {fp:6.2f}ms | fwd+bwd xla {bx:6.2f}ms pallas {bp:6.2f}ms"
        )
    print(f"TOTAL (fwd + fwd/bwd, x2 directions/step): xla {2*total_x:.1f}ms pallas {2*total_p:.1f}ms")


if __name__ == "__main__":
    main()
