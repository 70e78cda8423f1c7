#!/usr/bin/env python
"""Hardware bench + parity check: windowed Pallas splat vs XLA scatter-add.

Prices the unit-mass bilinear forward splat (the flow-mode occlusion mask,
ops/splat.py) at the three loss scales of the b8 256x832 training config
(2B=16 flow directions per step), kernel vs the scatter form, and verifies
value parity on the chip (hardware vs interpret was 0.0 for the warp
kernel; here hardware vs XLA scatter must sit at f32 accumulation noise).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_splat_window.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas.splat_window import (
    splat_mass_window,
)
from unsupervised_depth_opticalflow_egomotion_tpu.ops.splat import forward_splat


def _timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out))  # force through the relay
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def _kitti_like_flow(rng, b, h, w):
    """Smooth flow with KITTI-like magnitudes (|u|<~130, |v|<~35 px at
    832 wide), scaled to the plane size."""
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    u = (
        60.0 * (gx / w - 0.5)
        + 25.0 * np.sin(2 * np.pi * gy / h)
        + rng.uniform(-3, 3, (b, h, w))
    ) * (w / 832.0)
    v = (
        18.0 * (gy / h - 0.5)
        + 8.0 * np.cos(2 * np.pi * gx / w)
        + rng.uniform(-2, 2, (b, h, w))
    ) * (h / 256.0)
    return jnp.asarray(np.stack([u, v], axis=-1), jnp.float32)


def main():
    rng = np.random.RandomState(0)
    b = 16  # 2 directions x batch 8
    print(f"{'shape':>18} | {'xla ms':>8} | {'pallas ms':>9} | {'speedup':>7} | max|diff|")
    for h, w in ((256, 832), (128, 416), (64, 208)):
        flow = _kitti_like_flow(rng, b, h, w)
        ones = jnp.ones((b, h, w, 1), jnp.float32)

        xla_fn = jax.jit(lambda f: forward_splat(ones, f))
        pls_fn = jax.jit(lambda f: splat_mass_window(f))

        ref = xla_fn(flow)
        out = pls_fn(flow)
        diff = float(jnp.max(jnp.abs(out - ref)))

        t_xla = _timeit(xla_fn, flow)
        t_pls = _timeit(pls_fn, flow)
        print(
            f"{b}x{h}x{w:>4} | {t_xla:8.2f} | {t_pls:9.2f} | "
            f"{t_xla / t_pls:6.2f}x | {diff:.2e}"
        )

    # dropped-row guard at KITTI-scale flow: must be identically zero
    flow = _kitti_like_flow(rng, b, 256, 832)
    _, dropped = jax.jit(
        lambda f: splat_mass_window(f, with_stats=True)
    )(flow)
    print("dropped rows (KITTI-scale flow):", int(jnp.max(dropped)))


if __name__ == "__main__":
    main()
