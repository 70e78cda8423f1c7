#!/usr/bin/env python
"""Hardware benchmark: PWC correlation, fused-XLA vs Pallas, per level shape.

Runs both implementations on the attached TPU across the five level shapes the
geom train step actually issues (batch 2B=16: both flow directions batched),
checks numerical agreement, and prints ms per call (fwd, and fwd+bwd for the
XLA form / the custom-VJP pallas wrapper once wired).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_corr.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from unsupervised_depth_opticalflow_egomotion_tpu.ops.cost_volume import correlation
from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas.correlation import (
    correlation_pallas,
)

# (B, H, W, C) of the five PWC levels in the geom step at b8 256x832
SHAPES = [
    (16, 4, 13, 196),
    (16, 8, 26, 128),
    (16, 16, 52, 96),
    (16, 32, 104, 64),
    (16, 64, 208, 32),
]


def timeit(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0].device_kind}")
    xla_j = jax.jit(correlation)

    def grad_wrap(corr_fn):
        def loss(f1, f2):
            return jnp.sum(corr_fn(f1, f2).astype(jnp.float32))

        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    xla_g = grad_wrap(correlation)

    for shape in SHAPES:
        b, h, w, c = shape
        f1 = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)
        f2 = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)

        ref = np.asarray(xla_j(f1, f2).astype(jnp.float32))
        try:
            pal = np.asarray(correlation_pallas(f1, f2).astype(jnp.float32))
            err = np.max(np.abs(ref - pal))
            t_pal = timeit(correlation_pallas, f1, f2)
            pal_str = f"pallas fwd {t_pal:6.2f} ms  max|err| {err:.2e}"
        except Exception as e:  # noqa: BLE001 - report, keep benching
            pal_str = f"pallas FAILED: {type(e).__name__}: {str(e)[:80]}"

        t_xla = timeit(xla_j, f1, f2)
        g = xla_g(f1, f2)
        float(jnp.sum(g[0]).astype(jnp.float32))
        t_xla_g = timeit(lambda a, bb: xla_g(a, bb)[0], f1, f2)
        print(
            f"{b}x{h}x{w}x{c}: xla fwd {t_xla:6.2f} ms  fwd+bwd {t_xla_g:6.2f} ms | {pal_str}"
        )


if __name__ == "__main__":
    main()
