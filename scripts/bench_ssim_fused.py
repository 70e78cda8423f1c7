"""Validate + time the fused SSIM kernel on real TPU at training shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas.ssim_fused import (
    ssim_fused,
)
from unsupervised_depth_opticalflow_egomotion_tpu.ops.ssim import ssim_xla

SHAPES = [(16, 256, 832, 3), (16, 128, 416, 3), (16, 64, 208, 3)]


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("backend:", jax.default_backend())
    for shape in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(*shape).astype(np.float32), jnp.bfloat16)
        y = jnp.asarray(rng.rand(*shape).astype(np.float32), jnp.bfloat16)
        cot = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)

        want = np.asarray(ssim_xla(x, y), np.float32)
        got = np.asarray(ssim_fused(x, y), np.float32)
        err = np.abs(got - want).max()

        def lx(a, b):
            return jnp.sum((ssim_xla(a, b) * cot).astype(jnp.float32))

        def lp(a, b):
            return jnp.sum((ssim_fused(a, b) * cot).astype(jnp.float32))

        gx = jax.jit(jax.grad(lx, argnums=(0, 1)))
        gp = jax.jit(jax.grad(lp, argnums=(0, 1)))
        dxw, dyw = gx(x, y)
        dxg, dyg = gp(x, y)
        gerr = max(
            np.abs(np.asarray(dxg, np.float32) - np.asarray(dxw, np.float32)).max(),
            np.abs(np.asarray(dyg, np.float32) - np.asarray(dyw, np.float32)).max(),
        )
        fx = timeit(jax.jit(ssim_xla), x, y)
        fp = timeit(jax.jit(lambda a, b: ssim_fused(a, b)), x, y)
        bx = timeit(gx, x, y)
        bp = timeit(gp, x, y)
        print(
            f"{str(shape):>20} err={err:.4f} gerr={gerr:.4f} "
            f"fwd xla {fx:6.2f} pallas {fp:6.2f} | fwd+bwd xla {bx:6.2f} pallas {bp:6.2f}"
        )


if __name__ == "__main__":
    main()
