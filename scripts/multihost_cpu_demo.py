#!/usr/bin/env python
"""Multi-host validation harness on CPU: N processes x M fake devices.

Launches ``--num_processes`` subprocesses that each initialize
``jax.distributed``, build ONE global 1-D data mesh over all processes'
devices (xla_force_host_platform_device_count fakes M chips per process),
feed per-process shards via ``make_global_batch``, and run real sharded
train steps of the flagship geom objective at a tiny resolution. The
processes print their per-step global loss; the parent asserts every
process agrees (the gradient all-reduce spans the DCN-analog boundary).

This is the CPU stand-in for a TPU pod launch of train.py with
--num_processes/--process_id (parallel/mesh.py:distributed_init).

Run: python scripts/multihost_cpu_demo.py --num_processes 2 --local_devices 2
Child: invoked internally with --process_id >= 0.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = 49731


def child(args):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices} "
        + os.environ.get("XLA_FLAGS", "")
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from unsupervised_depth_opticalflow_egomotion_tpu.config import Config
    from unsupervised_depth_opticalflow_egomotion_tpu.parallel import (
        distributed_init,
        init_state,
        make_global_batch,
        make_mesh,
        make_optimizer,
        make_train_step,
    )

    distributed_init(f"localhost:{PORT}", args.num_processes, args.process_id)
    assert jax.process_count() == args.num_processes
    n_global = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global, (len(jax.devices()), n_global)

    h, w = 64, 128
    global_bsz = n_global  # one item per fake chip
    local_bsz = global_bsz // args.num_processes
    # default mode "depth": the host here has ONE core, and N processes
    # concurrently compiling the full geom graph on CPU takes tens of
    # minutes; the depth step exercises the identical multi-process
    # machinery (global mesh, make_global_batch, grad all-reduce, optax)
    # with a much smaller compile. --mode geom runs the flagship graph.
    cfg = Config(
        img_hw=(h, w), mode=args.mode, compute_dtype="float32",
        batch_size=global_bsz, remat=False,
    )
    print(f"proc{args.process_id} compiling {args.mode} step...", flush=True)
    mesh = make_mesh()
    model, state = init_state(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, state.params)
    step_fn = make_train_step(model, cfg, tx, mesh=mesh)

    # per-process local shard: DIFFERENT data per process (seeded by
    # process_id, the shard_id pattern of KittiPreparedDataset)
    rng = np.random.RandomState(100 + args.process_id)
    K = np.array([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]], np.float32)
    K_ms = np.stack(
        [np.diag([1 / 2**s, 1 / 2**s, 1.0]).astype(np.float32) @ K for s in range(3)]
    )
    K_inv = np.stack([np.linalg.inv(k) for k in K_ms])

    key = jax.random.PRNGKey(1)
    for step in range(args.steps):
        local = (
            (rng.rand(local_bsz, 3 * h, w, 3) * 255).astype(np.uint8),
            np.tile(K_ms[None], (local_bsz, 1, 1, 1)),
            np.tile(K_inv[None], (local_bsz, 1, 1, 1)),
        )
        batch = make_global_batch(local, mesh, cfg.data_axis)
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        print(
            f"proc{args.process_id} step{step} loss={float(metrics['loss_total']):.6f}",
            flush=True,
        )
    print(f"proc{args.process_id} OK", flush=True)


def parent(args):
    procs = []
    for pid in range(args.num_processes):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--num_processes", str(args.num_processes),
                    "--local_devices", str(args.local_devices),
                    "--steps", str(args.steps),
                    "--mode", args.mode,
                    "--process_id", str(pid),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=args.timeout)[0] for p in procs]
    losses = {}
    ok = 0
    for pid, out in enumerate(outs):
        print(f"--- proc {pid} ---\n{out}")
        if procs[pid].returncode != 0:
            raise SystemExit(f"process {pid} failed (rc {procs[pid].returncode})")
        for line in out.splitlines():
            if line.startswith(f"proc{pid} step"):
                step = int(line.split("step")[2].split(" ")[0])
                losses.setdefault(step, []).append(float(line.split("loss=")[1]))
            if line.strip() == f"proc{pid} OK":
                ok += 1
    assert ok == args.num_processes, f"only {ok} processes finished"
    for step, vals in losses.items():
        spread = max(vals) - min(vals)
        assert spread < 1e-5, f"step {step}: processes disagree on loss {vals}"
    print(f"MULTIHOST OK: {args.num_processes} procs x {args.local_devices} "
          f"devices, {args.steps} steps, losses agree")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--local_devices", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--mode", default="depth", choices=["flow", "depth", "geom"])
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--process_id", type=int, default=-1)
    a = ap.parse_args()
    if a.process_id >= 0:
        child(a)
    else:
        parent(a)
