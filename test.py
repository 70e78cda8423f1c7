#!/usr/bin/env python
"""Evaluation CLI mirroring the reference's task surface
(/root/reference/test.py:314-377):

    python test.py -c configs/kitti_geom.yaml --task kitti_depth \
        --pretrained_model ckpt_dir --result_dir results/

Tasks: kitti_depth | kitti_flow_2012 | kitti_flow_2015 | kitti_pose | demo.
"""

from __future__ import annotations

import argparse
import os

import jax

from unsupervised_depth_opticalflow_egomotion_tpu.config import load_config
from unsupervised_depth_opticalflow_egomotion_tpu import eval_tasks
from unsupervised_depth_opticalflow_egomotion_tpu.evaluation import (
    format_flow_metrics,
    load_gt_flow_kitti,
    load_gt_mask,
)
from unsupervised_depth_opticalflow_egomotion_tpu.parallel import init_state
from unsupervised_depth_opticalflow_egomotion_tpu.utils import CheckpointManager


def main():
    parser = argparse.ArgumentParser(description="TPU-native TrianFlow-style testing")
    parser.add_argument("-c", "--config_file", default=None)
    parser.add_argument(
        "--mode", default="geom", choices=["flow", "depth", "geom", "two_view"],
        help="two_view = legacy TrianFlow pipeline: flow -> RANSAC-F -> pose "
        "(reference test.py:33,64 non-geom branch)",
    )
    parser.add_argument(
        "--task",
        default="kitti_depth",
        choices=[
            "kitti_depth", "kitti_flow_2012", "kitti_flow_2015", "kitti_pose",
            "nyu_depth", "demo",
        ],
    )
    parser.add_argument("--image_path", default=None, help="for --task demo")
    parser.add_argument("--pretrained_model", default=None, help="checkpoint dir")
    parser.add_argument("--result_dir", default="./results")
    parser.add_argument("--write_submission", action="store_true")
    parser.add_argument("--export_trajectory", action="store_true")
    args = parser.parse_args()

    cfg = load_config(
        args.config_file, mode="geom" if args.mode == "two_view" else args.mode,
        model_dir=args.result_dir,
        compute_dtype="float32",  # eval in full precision
    )
    os.makedirs(args.result_dir, exist_ok=True)

    model, state = init_state(cfg, jax.random.PRNGKey(0))
    if args.pretrained_model:
        ckpt = CheckpointManager(args.pretrained_model)
        state = ckpt.restore(state)
        print(f"restored checkpoint from {args.pretrained_model}")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    flow_fn, disp_fn, pose_fn = eval_tasks.make_inference_fns(model, variables)

    two_view_fn = None
    if args.mode == "two_view":
        # legacy pipeline shares the flow/depth sub-nets: subset the joint
        # checkpoint into TriangulationPoseModel variables
        from unsupervised_depth_opticalflow_egomotion_tpu.models import (
            TriangulationPoseModel,
        )

        tv = TriangulationPoseModel(
            num_scales=cfg.num_scales,
            ransac_iters=cfg.ransac_iters,
            ransac_points=cfg.ransac_points,
        )
        tv_vars = {
            "params": {k: variables["params"][k] for k in ("fpyramid", "pwc", "depth_net")},
            "batch_stats": {"depth_net": variables["batch_stats"]["depth_net"]},
        }
        two_view_fn = eval_tasks.make_two_view_inference_fn(tv, tv_vars)

    if args.task == "kitti_depth":
        res = eval_tasks.test_eigen_depth(cfg, disp_fn)
        names = ["abs_rel", "sq_rel", "rms", "log_rms", "a1", "a2", "a3"]
        print(", ".join(f"{n}={v:.4f}" for n, v in zip(names, res)))
    elif args.task in ("kitti_flow_2012", "kitti_flow_2015"):
        mode = "kitti_2012" if args.task == "kitti_flow_2012" else "kitti_2015"
        gt_dir = cfg.gt_2012_dir if mode == "kitti_2012" else cfg.gt_2015_dir
        gt_flows, noc_masks = load_gt_flow_kitti(gt_dir, mode)
        moving = load_gt_mask(gt_dir) if mode == "kitti_2015" else None
        sub_dir = os.path.join(args.result_dir, "submission") if args.write_submission else None
        m = eval_tasks.test_kitti_flow(
            cfg, flow_fn, gt_flows, noc_masks, mode, moving_masks=moving,
            submission_dir=sub_dir, two_view_fn=two_view_fn,
        )
        print(f"[EVAL] [{mode}]")
        print(format_flow_metrics(m))
    elif args.task == "nyu_depth":
        from unsupervised_depth_opticalflow_egomotion_tpu.data import (
            load_nyu_test_data,
            test_nyu_depth,
        )

        if not cfg.nyu_test_dir:
            raise SystemExit(
                "--task nyu_depth needs cfg.nyu_test_dir pointing at a dir with "
                "nyu_depth_v2_labeled.mat + splits.mat"
            )
        test_images, test_depths = load_nyu_test_data(cfg.nyu_test_dir)
        res = test_nyu_depth(cfg, disp_fn, test_images, test_depths)
        names = ["abs_rel", "sq_rel", "rms", "log10", "a1", "a2", "a3"]
        print(", ".join(f"{n}={v:.4f}" for n, v in zip(names, res)))
    elif args.task == "kitti_pose":
        mean_err, std_err = eval_tasks.test_pose_odom(cfg, pose_fn)
        print("Results")
        print("\t {:>10}, {:>10}".format("ATE", "RE"))
        print("mean \t {:10.4f}, {:10.4f}".format(*mean_err))
        print("std \t {:10.4f}, {:10.4f}".format(*std_err))
        if args.export_trajectory:
            from unsupervised_depth_opticalflow_egomotion_tpu.evaluation import KittiEvalOdom

            for seq in cfg.sequences:
                out_txt = os.path.join(args.result_dir, f"{seq}_pred.txt")
                eval_tasks.export_trajectory(cfg, pose_fn, seq, out_txt)
                gt_txt = os.path.join(cfg.kitti_odom_dir, "poses", f"{seq}.txt")
                if os.path.isfile(gt_txt):
                    KittiEvalOdom().eval(gt_txt, out_txt, seq=seq)
    elif args.task == "demo":
        assert args.image_path, "--image_path required for demo"
        eval_tasks.test_single_image(args.image_path, disp_fn, cfg.img_hw, args.result_dir)
        print(f"Depth prediction saved in {args.result_dir}")


if __name__ == "__main__":
    main()
