"""Windowed Pallas warp vs the XLA row-gather sampler on the real chip.

Production shape: the geom step's scale-0 flow warp and depth
reconstruction each sample a [2B, 256, 832, 3] uint8 source (b8 -> 2B=16).
Flow statistics modeled as KITTI-like: smooth fields, |u| up to ~80 px,
|v| up to ~20 px, plus a uniform ego-motion component.

Usage: python scripts/bench_warp_window.py [B]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas.warp_window import (
    warp_gather_bf16x3,
    warp_gather_u8rgb,
)
from unsupervised_depth_opticalflow_egomotion_tpu.ops.warp import (
    grid_sample_with_weight,
    normalize_coords,
    pixel_grid,
)


def smooth_flow(rng, b, h, w, umax, vmax):
    """Low-frequency random flow + uniform egomotion component."""
    fu = rng.randn(b, h // 16, w // 16).astype(np.float32)
    fv = rng.randn(b, h // 16, w // 16).astype(np.float32)
    fu = jax.image.resize(jnp.asarray(fu), (b, h, w), "cubic") * (umax / 2.5)
    fv = jax.image.resize(jnp.asarray(fv), (b, h, w), "cubic") * (vmax / 2.5)
    fu = fu + rng.uniform(-umax / 2, umax / 2, (b, 1, 1))
    fv = fv + rng.uniform(-vmax / 2, vmax / 2, (b, 1, 1))
    return fu, fv


def bench(fn, *args, iters=30):
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    # usage: bench_warp_window.py [B] [bf16]
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    bf16 = len(sys.argv) > 2 and sys.argv[2] == "bf16"
    h, w = (128, 416) if bf16 else (256, 832)  # bf16 = the scale-1 shape
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(0, 256, (b, h, w, 3), np.uint8))
    if bf16:
        src = (src.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
    gather = warp_gather_bf16x3 if bf16 else warp_gather_u8rgb
    fu, fv = smooth_flow(rng, b, h, w, umax=80.0, vmax=20.0)
    grid = pixel_grid(h, w)
    ix = grid[None, :, :, 0] + fu
    iy = grid[None, :, :, 1] + fv
    coords = normalize_coords(jnp.stack([ix, iy], -1), h, w)

    @jax.jit
    def xla_fwd(src, coords):
        return grid_sample_with_weight(src, coords, out_dtype=jnp.bfloat16)

    @jax.jit
    def pallas_fwd(src, ix, iy):
        return gather(src, ix, iy, out_dtype=jnp.bfloat16)

    def loss_xla(coords):
        o, ws = grid_sample_with_weight(src, coords, out_dtype=jnp.bfloat16)
        return jnp.sum(o.astype(jnp.float32) ** 2) + jnp.sum(
            ws.astype(jnp.float32)
        )

    def loss_pal(ix, iy, fused=False):
        o, ws = gather(src, ix, iy, out_dtype=jnp.bfloat16, fused=fused)
        return jnp.sum(o.astype(jnp.float32) ** 2) + jnp.sum(
            ws.astype(jnp.float32)
        )

    @jax.jit
    def pallas_fwd_fused(src, ix, iy):
        return gather(src, ix, iy, out_dtype=jnp.bfloat16, fused=True)

    xla_g = jax.jit(jax.grad(loss_xla))
    pal_g = jax.jit(jax.grad(loss_pal, argnums=(0, 1)))
    pal_gf = jax.jit(
        jax.grad(lambda a, b: loss_pal(a, b, fused=True), argnums=(0, 1))
    )

    # value check on hardware
    o_x, w_x = xla_fwd(src, coords)
    o_p, w_p = pallas_fwd(src, ix, iy)
    err = float(jnp.max(jnp.abs(o_x.astype(jnp.float32) - o_p.astype(jnp.float32))))
    errw = float(jnp.max(jnp.abs(w_x.astype(jnp.float32) - w_p.astype(jnp.float32))))
    print(f"max |out| err={err:.4g}  |wsum| err={errw:.4g}")

    # fused-vs-standalone grad check on hardware
    g_p = pal_g(ix, iy)
    g_f = pal_gf(ix, iy)
    errg = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_p, g_f)
    )
    print(f"max fused-vs-standalone grad err={errg:.4g}")

    t_xf = bench(xla_fwd, src, coords)
    t_pf = bench(pallas_fwd, src, ix, iy)
    t_pff = bench(pallas_fwd_fused, src, ix, iy)
    t_xg = bench(xla_g, coords)
    t_pg = bench(pal_g, ix, iy)
    t_pgf = bench(pal_gf, ix, iy)
    print(
        f"[{b},{h},{w}] fwd:      xla {t_xf:.2f} ms   pallas {t_pf:.2f} ms"
        f"   fused {t_pff:.2f} ms"
    )
    print(
        f"[{b},{h},{w}] fwd+bwd:  xla {t_xg:.2f} ms   pallas {t_pg:.2f} ms"
        f"   fused {t_pgf:.2f} ms"
    )


if __name__ == "__main__":
    main()
