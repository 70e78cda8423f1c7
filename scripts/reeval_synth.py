#!/usr/bin/env python
"""Re-score saved synthetic-run checkpoints with the CURRENT eval chain.

Needed because the depth-eval convention fix (mirroring the reference's
double inversion -- see eval_tasks.test_eigen_depth) landed while curriculum
stages were mid-flight: their in-run eval records used the broken chain.
Training itself was unaffected (eval is observation only), so re-scoring the
checkpoints yields the corrected trajectories.

Run: python scripts/reeval_synth.py --ckpt /tmp/c2_depth/ckpt --data /tmp/synth_world2 [--steps 1000 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from unsupervised_depth_opticalflow_egomotion_tpu import eval_tasks
from unsupervised_depth_opticalflow_egomotion_tpu.config import Config
from unsupervised_depth_opticalflow_egomotion_tpu.parallel import build_model, init_state
from unsupervised_depth_opticalflow_egomotion_tpu.utils import CheckpointManager

from train_synth_long import load_eval_set, synth_eval  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", default="/tmp/synth_world2")
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 832])
    ap.add_argument("--grad_clip", type=float, default=10.0)
    ap.add_argument("--steps", type=int, nargs="*", default=None,
                    help="checkpoint steps to score (default: all)")
    args = ap.parse_args()

    cfg = Config(
        img_hw=tuple(args.hw), mode="geom", compute_dtype="bfloat16",
        batch_size=8, grad_clip_norm=args.grad_clip,
    )
    model, state = init_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(args.ckpt)
    eval_model = build_model(cfg.replace(compute_dtype="float32"))
    flow_fn_v, disp_fn_v, pose_fn_v = eval_tasks.make_inference_fns(eval_model)
    eval_set = load_eval_set(args.data)

    steps = args.steps or sorted(
        int(d) for d in os.listdir(args.ckpt) if d.isdigit()
    )
    for step in steps:
        st = mgr.restore(state, step)
        variables = {"params": st.params, "batch_stats": st.batch_stats}
        m = synth_eval(
            eval_set,
            lambda a, b: flow_fn_v(variables, a, b),
            lambda a: disp_fn_v(variables, a),
            pose_fn=lambda x: pose_fn_v(variables, x),
        )
        print(json.dumps({"ckpt": args.ckpt, "step": step, "eval": m}), flush=True)


if __name__ == "__main__":
    main()
