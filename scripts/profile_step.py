#!/usr/bin/env python
"""Capture an xprof trace of the geom train step and print the top ops.

Writes the trace under /tmp/xprof_step; if the xplane parser is available,
prints a self-time ranking of device ops so optimization is data-driven.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_step.py
"""

from __future__ import annotations

import glob
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from unsupervised_depth_opticalflow_egomotion_tpu.config import Config
from unsupervised_depth_opticalflow_egomotion_tpu.parallel import (
    init_state,
    make_optimizer,
    make_train_step,
)

LOGDIR = f"/tmp/xprof_step/{os.getpid()}"  # fresh dir: stale xplane files
# from earlier sessions break the converter (it merges all globbed planes)


def main():
    B, H, W = 8, 256, 832
    cfg = Config(img_hw=(H, W), mode="geom", compute_dtype="bfloat16", batch_size=B)
    model, state = init_state(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, state.params)
    step_fn = make_train_step(model, cfg, tx)

    rng = np.random.RandomState(0)
    # uint8 frames = the production loader path (bench.py does the same)
    images = jax.numpy.asarray((rng.rand(B, 3 * H, W, 3) * 255).astype(np.uint8))
    K = np.array([[241.0, 0, W / 2], [0, 245.0, H / 2], [0, 0, 1]], np.float32)
    K_ms = np.stack(
        [np.diag([1 / 2**s, 1 / 2**s, 1.0]).astype(np.float32) @ K for s in range(3)]
    )
    K_inv = np.stack([np.linalg.inv(k) for k in K_ms])
    batch = (
        images,
        jax.numpy.asarray(np.tile(K_ms[None], (B, 1, 1, 1))),
        jax.numpy.asarray(np.tile(K_inv[None], (B, 1, 1, 1))),
    )
    key = jax.random.PRNGKey(1)
    state, metrics = step_fn(state, batch, key)
    float(metrics["loss_total"])  # force

    with jax.profiler.trace(LOGDIR):
        for _ in range(3):
            state, metrics = step_fn(state, batch, key)
        float(metrics["loss_total"])

    planes = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", planes)
    if not planes:
        return
    try:
        from xprof.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(planes, "op_profile", {})
        out = f"{LOGDIR}/op_profile.json"
        with open(out, "wb") as f:
            f.write(data if isinstance(data, bytes) else data.encode())
        print("wrote", out)
    except Exception as e:  # noqa: BLE001
        print("op_profile conversion failed:", type(e).__name__, str(e)[:200])
        try:
            from xprof.convert import raw_to_tool_data as rtd

            data, _ = rtd.xspace_to_tool_data(planes, "framework_op_stats", {})
            out = f"{LOGDIR}/op_stats.json"
            with open(out, "wb") as f:
                f.write(data if isinstance(data, bytes) else data.encode())
            print("wrote", out)
        except Exception as e2:  # noqa: BLE001
            print("op_stats conversion failed:", type(e2).__name__, str(e2)[:200])


if __name__ == "__main__":
    main()
