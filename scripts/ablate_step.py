#!/usr/bin/env python
"""Decompose the geom train-step time by differentiating subsets of the loss
pack (XLA prunes everything a subset does not need) and by timing the bare
network fwd+bwd subgraphs. Run on the TPU: python scripts/ablate_step.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from unsupervised_depth_opticalflow_egomotion_tpu.config import Config
from unsupervised_depth_opticalflow_egomotion_tpu.parallel import init_state
from unsupervised_depth_opticalflow_egomotion_tpu.parallel.train_step import build_model

B, H, W = 8, 256, 832


def timeit(fn, *args, iters=20):
    r = fn(*args)
    float(jnp.asarray(r).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.asarray(r).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = Config(img_hw=(H, W), mode="geom", compute_dtype="bfloat16", batch_size=B)
    model, state = init_state(cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, 3 * H, W, 3).astype(np.float32))
    K = np.array([[241.0, 0, W / 2], [0, 245.0, H / 2], [0, 0, 1]], np.float32)
    K_ms = np.stack([np.diag([1 / 2**s, 1 / 2**s, 1.0]).astype(np.float32) @ K for s in range(3)])
    K_inv = np.stack([np.linalg.inv(k) for k in K_ms])
    K_ms = jnp.asarray(np.tile(K_ms[None], (B, 1, 1, 1)))
    K_inv = jnp.asarray(np.tile(K_inv[None], (B, 1, 1, 1)))
    key = jax.random.PRNGKey(1)

    def subset_grad(keys):
        def loss_fn(params):
            (pack, _), _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, K_ms, K_inv, rng=key, train=True,
                method=model.forward_geom, mutable=["batch_stats"],
            )
            return sum(jnp.mean(pack[k]) for k in keys)

        g = jax.jit(jax.grad(loss_fn))

        def run(p):
            gr = g(p)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)), gr, 0.0
            )

        return jax.jit(run)

    ALL = [
        "loss_depth_pixel", "loss_depth_smooth", "loss_flow_pixel",
        "loss_flow_ssim", "loss_flow_smooth", "loss_flow_consis",
        "loss_depth_flow_consis", "loss_epipolar",
    ]
    subsets = {
        "all-live": ALL,
        "depth-only (pixel+smooth)": ["loss_depth_pixel", "loss_depth_smooth"],
        "flow-only (4 terms)": [
            "loss_flow_pixel", "loss_flow_ssim", "loss_flow_smooth", "loss_flow_consis"
        ],
        "geom-only (dfc+epipolar)": ["loss_depth_flow_consis", "loss_epipolar"],
        "flow_pixel only": ["loss_flow_pixel"],
        "depth_pixel only": ["loss_depth_pixel"],
        "all minus smooths": [
            k for k in ALL if k not in ("loss_depth_smooth", "loss_flow_smooth")
        ],
        "all minus ssim": [k for k in ALL if k != "loss_flow_ssim"],
        "all minus consis": [k for k in ALL if k != "loss_flow_consis"],
    }
    for name, keys in subsets.items():
        ms = timeit(subset_grad(keys), state.params)
        print(f"{name:32s} {ms:7.1f} ms")

    # bare networks fwd+bwd
    img3 = images[:, :H]
    imgcat = jnp.concatenate([img3, img3, img3], axis=0)

    def depth_fwd(params):
        out = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            imgcat, True, method=lambda m, x, t: m.depth_net(x, t),
            mutable=["batch_stats"],
        )
        return sum(jnp.sum(d.astype(jnp.float32)) for d in out[0])

    def flow_fwd(params):
        v = {"params": params, "batch_stats": state.batch_stats}

        def call(m, a, b):
            fa = m.fpyramid(a)
            fb = m.fpyramid(b)
            return m.pwc(fa, fb, (H, W))

        out = model.apply(v, jnp.concatenate([img3, img3], 0), jnp.concatenate([img3, img3], 0), method=call)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in out)

    def pose_fwd(params):
        v = {"params": params, "batch_stats": state.batch_stats}
        out = model.apply(v, jnp.concatenate([img3, img3, img3], -1), method=lambda m, x: m.pose_net(x))
        return jnp.sum(out.astype(jnp.float32))

    for name, fn in (("depth_net 3B fwd+bwd", depth_fwd), ("fpyramid+pwc 2x2B fwd+bwd", flow_fwd), ("pose_net fwd+bwd", pose_fwd)):
        g = jax.jit(jax.grad(fn))
        run = jax.jit(lambda p, g=g: jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)), g(p), 0.0))
        ms = timeit(run, state.params)
        print(f"{name:32s} {ms:7.1f} ms")
        fwd_only = jax.jit(fn)
        ms = timeit(fwd_only, state.params)
        print(f"{name.replace('fwd+bwd', 'fwd-only'):32s} {ms:7.1f} ms")


if __name__ == "__main__":
    main()
