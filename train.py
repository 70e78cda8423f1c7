#!/usr/bin/env python
"""Training CLI: flow / depth / geom modes on KITTI.

Mirrors the reference CLI surface (/root/reference/train.py:225-299):

    python train.py -c configs/kitti_geom.yaml --mode geom --model_dir ckpt/

with the TPU-native internals: threaded host input pipeline, one pjit train
step over a data mesh, orbax checkpoints, interleaved benchmark eval.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax

from unsupervised_depth_opticalflow_egomotion_tpu.config import Config, load_config
from unsupervised_depth_opticalflow_egomotion_tpu.data import (
    KittiOdoPrep,
    KittiPreparedDataset,
    KittiRawPrep,
    make_loader,
)
from unsupervised_depth_opticalflow_egomotion_tpu import eval_tasks
from unsupervised_depth_opticalflow_egomotion_tpu.evaluation import (
    load_gt_flow_kitti,
    load_gt_mask,
)
from unsupervised_depth_opticalflow_egomotion_tpu.parallel import (
    distributed_init,
    init_state,
    local_replica,
    make_global_batch,
    make_mesh,
    make_optimizer,
    make_train_step,
)
from unsupervised_depth_opticalflow_egomotion_tpu.utils import (
    CheckpointManager,
    MetricLogger,
    graft_params,
    opt_layout_tag,
)


def prepare_data(cfg: Config) -> str:
    data_dir = cfg.prepared_base_dir
    if os.path.exists(os.path.join(data_dir, "train.txt")):
        return data_dir
    if not cfg.raw_base_dir or not os.path.isdir(cfg.raw_base_dir):
        raise FileNotFoundError(
            f"no prepared dataset at {data_dir!r} (missing train.txt) and "
            f"raw_base_dir={cfg.raw_base_dir!r} does not exist -- set "
            "prepared_base_dir to an existing prepared dataset or "
            "raw_base_dir to the KITTI raw download to prepare one"
        )
    if cfg.dataset == "kitti_depth":
        KittiRawPrep(cfg.raw_base_dir, cfg.static_frames_txt, cfg.test_scenes_txt).prepare(
            data_dir, num_workers=cfg.num_workers
        )
    elif cfg.dataset == "kitti_odo":
        KittiOdoPrep(cfg.raw_base_dir).prepare(data_dir, num_workers=cfg.num_workers)
    elif cfg.dataset == "nyu":
        # NYU scene dirs -> 3-frame stacks in the shared prepared format
        # (reference train.py:111-121; nyu_v2.py is missing upstream)
        from unsupervised_depth_opticalflow_egomotion_tpu.data import NyuPrep

        NyuPrep(cfg.raw_base_dir).prepare(
            data_dir, stride=cfg.nyu_stride, num_workers=cfg.num_workers
        )
    else:
        raise NotImplementedError(cfg.dataset)
    return data_dir


def run_interleaved_eval(cfg: Config, infer_fns, variables, logger, step, eval_ctx):
    flow_fn_v, disp_fn_v, _pose_fn_v = infer_fns
    flow_fn = lambda a, b: flow_fn_v(variables, a, b)
    disp_fn = lambda a: disp_fn_v(variables, a)
    if eval_ctx.get("gt_flows_2012") is not None:
        m = eval_tasks.test_kitti_flow(
            cfg, flow_fn, eval_ctx["gt_flows_2012"], eval_ctx["noc_masks_2012"], "kitti_2012"
        )
        print(f"[EVAL {step}] KITTI2012: {m}")
        logger.add_eval(step, "kitti_2012", m)
    if eval_ctx.get("gt_flows_2015") is not None:
        m = eval_tasks.test_kitti_flow(
            cfg,
            flow_fn,
            eval_ctx["gt_flows_2015"],
            eval_ctx["noc_masks_2015"],
            "kitti_2015",
            moving_masks=eval_ctx.get("gt_masks_2015"),
        )
        print(f"[EVAL {step}] KITTI2015: {m}")
        logger.add_eval(step, "kitti_2015", m)
    if cfg.mode in ("depth", "geom") and cfg.raw_base_dir:
        try:
            m = eval_tasks.test_eigen_depth(cfg, disp_fn)
            print(f"[EVAL {step}] eigen depth (absrel sqrel rms logrms a1 a2 a3): {m}")
            logger.add_eval(step, "eigen_depth", m)
        except FileNotFoundError as e:
            print(f"[EVAL {step}] eigen depth skipped: {e}")
    # pose eval for odometry runs (the reference never evals pose mid-training;
    # without this an odometry-preset geom run has no in-training pose signal)
    if cfg.mode in ("depth", "geom") and cfg.kitti_odom_dir:
        try:
            pose_fn = lambda imgs: _pose_fn_v(variables, imgs)
            mean_err, std_err = eval_tasks.test_pose_odom(cfg, pose_fn)
            print(
                f"[EVAL {step}] pose ATE={mean_err[0]:.4f}+-{std_err[0]:.4f} "
                f"RE={mean_err[1]:.4f}+-{std_err[1]:.4f}"
            )
            logger.add_eval(step, "pose_odom", (mean_err, std_err))
        except FileNotFoundError as e:
            print(f"[EVAL {step}] pose eval skipped: {e}")


def train(cfg: Config):
    # multi-host: join the coordination service BEFORE any jax device use
    # (SURVEY 2.7 DCN axis; no reference equivalent -- DataParallel is
    # single-process, /root/reference/train.py:59-60)
    distributed_init(cfg.coordinator_address, cfg.num_processes, cfg.process_id)
    is_main = jax.process_index() == 0
    mesh = make_mesh(cfg.num_devices, cfg.data_axis)
    if is_main:
        print(f"devices: {mesh.devices.tolist()}")
    if cfg.batch_size % jax.process_count():
        raise ValueError(
            f"global batch {cfg.batch_size} must divide process count "
            f"{jax.process_count()}"
        )
    local_bsz = cfg.batch_size // jax.process_count()

    model, state = init_state(cfg, jax.random.PRNGKey(cfg.seed))

    ckpt = CheckpointManager(os.path.join(cfg.model_dir, "ckpt"))
    layout = opt_layout_tag(cfg.fix_flow, cfg.fix_depth, cfg.fix_pose)
    ckpt_meta = {"opt_layout": layout, "mode": cfg.mode, "img_hw": list(cfg.img_hw)}
    start_step = 0
    if cfg.resume:
        step = cfg.iter_start if cfg.iter_start > 0 else None
        state = ckpt.restore(state, step, expect_opt_layout=layout)
        start_step = int(state.step)
        print(f"resumed from step {start_step}")
    else:
        # staged init: graft flow/depth-stage params (train.py:36-55)
        for stage_dir in (cfg.flow_pretrained_model, cfg.depth_pretrained_model):
            if stage_dir:
                donor_ckpt = CheckpointManager(stage_dir)
                donor = donor_ckpt.restore(state)
                state = state.replace(params=graft_params(state.params, donor.params))
                print(f"grafted params from {stage_dir}")

    tx = make_optimizer(cfg, state.params)
    step_fn = make_train_step(model, cfg, tx, mesh=mesh)

    data_dir = prepare_data(cfg)
    dataset = KittiPreparedDataset(
        data_dir,
        num_scales=cfg.num_scales,
        img_hw=cfg.img_hw,
        num_iterations=(cfg.num_iterations - start_step) * local_bsz,
        seed=cfg.seed,
        # uint8 to the device (4x smaller transfer; normalized on-device in
        # split_stack), bounded decode cache against re-reading hot PNGs
        cache_decoded_bytes=cfg.decode_cache_bytes,
        uint8_images=True,
        # multi-host: each process owns a stride of train.txt
        shard_id=jax.process_index(),
        num_shards=jax.process_count(),
    )
    loader = make_loader(
        dataset,
        local_bsz,
        impl=cfg.loader_impl,
        shuffle=True,
        num_workers=cfg.num_workers,
        seed=cfg.seed,
    )
    print(f"input pipeline: {type(loader).__name__}")

    eval_ctx = {}
    if cfg.gt_2012_dir:
        eval_ctx["gt_flows_2012"], eval_ctx["noc_masks_2012"] = load_gt_flow_kitti(
            cfg.gt_2012_dir, "kitti_2012"
        )
    if cfg.gt_2015_dir:
        eval_ctx["gt_flows_2015"], eval_ctx["noc_masks_2015"] = load_gt_flow_kitti(
            cfg.gt_2015_dir, "kitti_2015"
        )
        eval_ctx["gt_masks_2015"] = load_gt_mask(cfg.gt_2015_dir)

    logger = MetricLogger(cfg.model_dir)
    cfg.dump(os.path.join(cfg.model_dir, "config.json"))
    # eval inference runs in f32 (shares the f32 params; only the compute
    # dtype differs) and is compiled once, reused across interleaved evals
    from unsupervised_depth_opticalflow_egomotion_tpu.parallel import build_model

    eval_model = build_model(cfg.replace(compute_dtype="float32"))
    infer_fns = eval_tasks.make_inference_fns(eval_model)

    # periodic mask/disp/flow image dumps (reference train.py:177-209 logs 10
    # images every 10x vis_interval); a separate jitted forward off the hot path
    mask_fn = None
    if cfg.mode == "geom" and cfg.log_interval:
        @jax.jit
        def mask_fn(variables, images, K_ms, K_inv_ms):
            _, aux = eval_model.apply(
                variables, images, K_ms, K_inv_ms, train=False,
                method=eval_model.forward_geom, with_masks=True,
            )
            return aux

    # flow-mode occlusion schedule (flow_occ_switch_step): fast splat_nn for
    # the bulk of training, 4-tap bilinear splat for the convergence tail
    occ_switch = (
        cfg.flow_occ_switch_step
        if cfg.mode == "flow" and cfg.flow_occ_impl != "splat"
        else 0
    )

    rng = jax.random.PRNGKey(cfg.seed + 1)
    step = start_step
    for batch_np in loader:
        if step >= cfg.num_iterations:
            break
        # >= (not ==): a resume landing past the boundary must still switch
        if occ_switch and step >= occ_switch:
            occ_switch = 0
            cfg_tail = cfg.replace(flow_occ_impl="splat")
            step_fn = make_train_step(build_model(cfg_tail), cfg_tail, tx, mesh=mesh)
            if is_main:
                print(f"[{step}] occlusion schedule: switching to flow_occ_impl=splat")
        if (
            cfg.test_interval
            and step % cfg.test_interval == 0
            and step > start_step
            and is_main
        ):
            # multi-host: only the main process evals, against its local
            # replica (every host holds full params); the others keep
            # training data flowing
            variables = local_replica(
                {"params": state.params, "batch_stats": state.batch_stats}
            )
            run_interleaved_eval(cfg, infer_fns, variables, logger, step, eval_ctx)

        batch = make_global_batch(tuple(batch_np), mesh, cfg.data_axis)
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        step += 1

        if step % cfg.log_interval == 0 and is_main:
            scalars = {k: float(v) for k, v in metrics.items()}
            logger.add_scalars(step, scalars)
            logger.print_losses(step, cfg.num_iterations, scalars)
        if mask_fn is not None and step % (10 * cfg.log_interval) == 0 and is_main:
            from unsupervised_depth_opticalflow_egomotion_tpu.visualize import dump_mask_pack

            # LOCAL eval-model forward on the main process (numpy replica in,
            # local batch in) -- no cross-process collectives, so the other
            # hosts never need to participate
            variables = local_replica(
                {"params": state.params, "batch_stats": state.batch_stats}
            )
            aux = jax.device_get(mask_fn(variables, *tuple(batch_np)))
            h = batch_np[0].shape[1] // 3
            center = batch_np[0][0, h : 2 * h]
            if center.dtype == np.uint8:
                center = center.astype(np.float32) / 255.0
            dump_mask_pack(
                aux, center, os.path.join(cfg.model_dir, "images"), step, logger,
            )
        if cfg.save_interval and step % cfg.save_interval == 0 and is_main:
            # state is device_get to host numpy first, so the save is a
            # plain single-writer file write (every process holds the same
            # replica; only main writes)
            ckpt.save(step, local_replica(state), meta=ckpt_meta)
            logger.dump()

    if is_main:
        ckpt.save(step, local_replica(state), meta=ckpt_meta)
    logger.close()
    print("training done")


def main():
    parser = argparse.ArgumentParser(description="TPU-native TrianFlow-style training")
    parser.add_argument("-c", "--config_file", default=None)
    parser.add_argument("--mode", default=None, choices=["flow", "depth", "geom"])
    parser.add_argument("--model_dir", default=None)
    parser.add_argument("--prepared_base_dir", default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--num_iterations", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--resume", action="store_true", default=None)
    parser.add_argument("--iter_start", type=int, default=None)
    parser.add_argument("--flow_pretrained_model", default=None)
    parser.add_argument("--depth_pretrained_model", default=None)
    parser.add_argument("--fix_flow", action="store_true", default=None)
    parser.add_argument("--fix_depth", action="store_true", default=None)
    parser.add_argument("--fix_pose", action="store_true", default=None)
    parser.add_argument("--num_devices", type=int, default=None)
    parser.add_argument("--compute_dtype", default=None)
    parser.add_argument("--flow_occ_impl", default=None,
                        choices=["splat", "splat_nn", "splat_nn_half", "diff_weights"])
    parser.add_argument("--flow_occ_switch_step", type=int, default=None,
                        help="flow mode: switch flow_occ_impl -> splat at this "
                             "step (occlusion schedule; 0 = never)")
    parser.add_argument("--loss_base_scale", type=int, default=None,
                        help="half-resolution loss dial: base the loss "
                             "pyramid this many octaves below the input "
                             "(0 = reference behaviour; PERF.md/TRAINING.md)")
    # multi-host launch (one process per host; TPU pods autodetect the
    # coordinator when --coordinator_address is omitted)
    parser.add_argument("--coordinator_address", default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args()

    overrides = {k: v for k, v in vars(args).items() if k != "config_file"}
    cfg = load_config(args.config_file, **overrides)
    os.makedirs(cfg.model_dir, exist_ok=True)
    train(cfg)


if __name__ == "__main__":
    main()
