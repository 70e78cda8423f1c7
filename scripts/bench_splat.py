#!/usr/bin/env python
"""Time the flow-mode train step under each flow_occ_impl on the chip.

The forward-splat occlusion (4 scatter-adds x 2 dirs x num_scales) is the
flow-mode hot spot (TRAINING.md: diff_weights trains ~3.5x faster); this
bench prices "splat" vs the single-tap "splat_nn" vs "diff_weights".
Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_splat.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from unsupervised_depth_opticalflow_egomotion_tpu.config import Config
from unsupervised_depth_opticalflow_egomotion_tpu.parallel import (
    init_state,
    make_optimizer,
    make_train_step,
)

B, H, W = 8, 256, 832


def main():
    rng = np.random.RandomState(0)
    images = jnp.asarray((rng.rand(B, 3 * H, W, 3) * 255).astype(np.uint8))
    K = np.array([[241.0, 0, W / 2], [0, 245.0, H / 2], [0, 0, 1]], np.float32)
    K_ms = np.stack(
        [np.diag([1 / 2**s, 1 / 2**s, 1.0]).astype(np.float32) @ K for s in range(3)]
    )
    K_inv = np.stack([np.linalg.inv(k) for k in K_ms])
    batch = (
        images,
        jnp.asarray(np.tile(K_ms[None], (B, 1, 1, 1))),
        jnp.asarray(np.tile(K_inv[None], (B, 1, 1, 1))),
    )
    key = jax.random.PRNGKey(1)
    for impl in ("splat", "splat_nn", "splat_nn_half", "diff_weights"):
        cfg = Config(
            img_hw=(H, W), mode="flow", compute_dtype="bfloat16",
            batch_size=B, flow_occ_impl=impl,
        )
        model, state = init_state(cfg, jax.random.PRNGKey(0))
        tx = make_optimizer(cfg, state.params)
        step = make_train_step(model, cfg, tx)
        state, m = step(state, batch, key)
        float(m["loss_total"])
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            state, m = step(state, batch, key)
        float(m["loss_total"])
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{impl:14s} {ms:7.1f} ms/step  {B / ms * 1e3:6.1f} fps/chip")


if __name__ == "__main__":
    main()
