#!/usr/bin/env python
"""Measure the reference implementation's actual train-step time (torch CPU).

The reference publishes NO speed numbers (no benchmarks/ dir upstream), so the
``vs_baseline`` denominator in bench.py needs a measured anchor. This script
runs the reference's flagship geom-mode step -- Model_geometry forward
(/root/reference/core/networks/model_geometry.py:768-953) + weighted loss
backward + Adam -- on CPU at the training resolution and prints seconds/step
and frames/sec. BASELINE.md documents the A100 extrapolation derived from
this measurement plus a FLOP roofline (see bench.py --flops).

Run:  python scripts/bench_reference.py [--batch 1] [--iters 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from reference_oracle import load_reference_model_geometry  # noqa: E402

H, W = 256, 832

# train.py:211-214 applies generate_loss_weights_dict over the loss pack; the
# live geom weights (config/kitti_geom.yaml:20-34 via config_utils.py:3-22).
LOSS_WEIGHTS = {
    "loss_depth_pixel": 1.0,
    "loss_depth_smooth": 0.5,
    "loss_flow_pixel": 0.15,
    "loss_flow_ssim": 0.85,
    "loss_flow_smooth": 10.0,
    "loss_flow_consis": 0.01,
    "loss_depth_flow_consis": 1.0,
    "loss_epipolar": 0.1,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    MG = load_reference_model_geometry()
    cfg = SimpleNamespace(
        dataset="kitti_depth",
        num_scales=3,
        flow_consist_alpha=0.01,
        flow_consist_beta=0.5,
        num_input_frames=3,
        geometric_ratio=0.3,
        geometric_num=6000,
        pose_beta=1.0,
    )
    torch.manual_seed(0)
    model = MG(cfg).train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)

    rng = np.random.RandomState(0)
    b = args.batch
    imgs = torch.from_numpy(rng.rand(b, 3, 3 * H, W).astype(np.float32))
    K = np.array([[241.0, 0, W / 2], [0, 245.0, H / 2], [0, 0, 1]], np.float32)
    K_ms = np.stack(
        [np.diag([1 / 2**s, 1 / 2**s, 1.0]).astype(np.float32) @ K for s in range(3)]
    )
    K_inv = np.stack([np.linalg.inv(k) for k in K_ms])
    K_ms_b = torch.from_numpy(np.tile(K_ms[None], (b, 1, 1, 1)))
    K_inv_b = torch.from_numpy(np.tile(K_inv[None], (b, 1, 1, 1)))

    def step():
        opt.zero_grad()
        loss_pack, _ = model((imgs, K_ms_b, K_inv_b))
        loss = sum(w * loss_pack[k].mean() for k, w in LOSS_WEIGHTS.items())
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup (allocator, lazy init)
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    s_per_step = float(np.median(times))
    print(
        f"reference geom step (torch CPU, {torch.get_num_threads()} threads, "
        f"b{b} {H}x{W}): {s_per_step:.2f} s/step = {b / s_per_step:.3f} frames/s"
    )


if __name__ == "__main__":
    main()
