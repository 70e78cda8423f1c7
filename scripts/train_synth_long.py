#!/usr/bin/env python
"""Long geom-mode training on the exact synthetic world, on the real chip.

The environment has no KITTI download, so this is the stability + learning
evidence run the round-1 verdict asked for: thousands of full-resolution
(256x832, b8, bf16) joint train steps with

- loss trajectories (JSONL + stdout),
- mask occupancy rates (occlusion / dynamic / valid / fused -- the classic
  failure mode of this loss family is mask collapse),
- interleaved synthetic eval: flow EPE and depth AbsRel/a1 against the
  generator's exact GT (scripts/synth_world.py),
- periodic mask/disp/flow image dumps (visualize.dump_mask_pack).

Results land in <out>/curves.jsonl, <out>/images/, and a final summary that
scripts/publish_synth_results.py folds into BASELINE.json "published".

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/train_synth_long.py \
         --steps 5000 --out /tmp/synth_run
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from unsupervised_depth_opticalflow_egomotion_tpu import eval_tasks
from unsupervised_depth_opticalflow_egomotion_tpu.config import Config
from unsupervised_depth_opticalflow_egomotion_tpu.data import (
    BatchLoader,
    KittiPreparedDataset,
)
from unsupervised_depth_opticalflow_egomotion_tpu.evaluation.depth_metrics import (
    compute_errors,
)
from unsupervised_depth_opticalflow_egomotion_tpu.evaluation import (
    compute_snippet_pose_error,
)
from unsupervised_depth_opticalflow_egomotion_tpu.ops.geometry import pose_vec2mat
from unsupervised_depth_opticalflow_egomotion_tpu.parallel import (
    build_model,
    init_state,
    make_optimizer,
    make_train_step,
)
from unsupervised_depth_opticalflow_egomotion_tpu.utils import CheckpointManager


def load_eval_set(data_dir):
    out = []
    for f in sorted(glob.glob(os.path.join(data_dir, "eval_gt", "*.npz"))):
        out.append(dict(np.load(f)))
    return out


def _snippet_from_warps(warp_mats):
    """3-frame snippet camera poses in frame-0 coords from center->cam_k
    warp transforms [3,3,4] (X_camk = R X_c + t).

    Mirrors the reference's pose-eval chain (test.py:153-165 /
    eval_tasks.test_pose_odom): invert each warp to the camera's pose in the
    center frame, then re-express relative to the first frame.
    """
    rot = np.linalg.inv(warp_mats[:, :, :3])
    tr = -rot @ warp_mats[:, :, -1:]
    mats = np.concatenate([rot, tr], axis=-1)
    first_inv = warp_mats[0]
    final = first_inv[:, :3] @ mats
    final[:, :, -1:] += first_inv[:, -1:]
    return final


def _zero_motion_error(gt_snip):
    """ATE/RE of the all-identity prediction (the scale alignment is
    degenerate at zero translation: s*0 = 0 whatever s, so ATE is just the
    GT position norm)."""
    n = gt_snip.shape[0]
    ate = float(np.linalg.norm(gt_snip[:, :, -1].reshape(-1))) / n
    re = 0.0
    for g in gt_snip:
        R = g[:, :3]
        s = np.linalg.norm(
            [R[0, 1] - R[1, 0], R[1, 2] - R[2, 1], R[0, 2] - R[2, 0]]
        )
        c = np.trace(R) - 1
        re += np.arctan2(s, c)
    return ate, re / n


def synth_eval(eval_set, flow_fn, disp_fn, do_flow=True, do_depth=True,
               pose_fn=None):
    """Flow EPE + depth metrics + snippet pose ATE/RE vs the exact GT.

    Worlds generated with --n_movers carry noc_mask (visible in the target
    view) and dyn_mask (independently-moving pixels); those add epe_noc and
    epe_dyn -- the KITTI-style noc/occ + moving-region breakdown.

    With ``pose_fn`` (and a world whose eval npz carries R_bwd/t_bwd --
    regenerate with the round-4 scripts/synth_world.py) also scores the
    3-frame-snippet scale-aligned ATE/RE of the PoseNet against the
    generator's exact ego-motion, mirroring the reference's 5-frame KITTI
    odometry protocol (test.py:135-194), plus the zero-motion baseline
    (identity poses) for reference."""
    epes, epes_noc, epes_dyn, absrel, a1 = [], [], [], [], []
    # intersection splits (round-5 verdict weak #5): does the flat epe_dyn
    # come from occluded mover pixels (which no visible-pixel loss can fix)
    # or from visible mover pixels (a live target for the dyna machinery)?
    epes_dyn_vis, epes_dyn_occ, epes_occ = [], [], []
    # per-scene median depth scale factors (round-5 verdict weak #6): test
    # whether the within-run AbsRel oscillation is eval-scale drift
    scene_scales, scene_absrel = [], []
    ates, res, ates_zero, res_zero = [], [], [], []
    for s in eval_set:
        img_c = s["img_c"].astype(np.float32) / 255.0
        img_r = s["img_r"].astype(np.float32) / 255.0
        h, w = img_c.shape[:2]
        if do_flow:
            flow = np.asarray(flow_fn(img_c[None], img_r[None]))[0]
            gt = s["flow_fwd"]
            xs, ys = np.meshgrid(np.arange(w), np.arange(h))
            inb = (
                (xs + gt[..., 0] >= 0)
                & (xs + gt[..., 0] < w - 1)
                & (ys + gt[..., 1] >= 0)
                & (ys + gt[..., 1] < h - 1)
                & s["valid"]
            )
            err = np.linalg.norm(flow - gt, axis=-1)
            epes.append(float(err[inb].mean()))
            if "noc_mask" in s:
                m = inb & s["noc_mask"]
                if m.any():
                    epes_noc.append(float(err[m].mean()))
                m = inb & ~s["noc_mask"]
                if m.any():
                    epes_occ.append(float(err[m].mean()))
            if "dyn_mask" in s and s["dyn_mask"].any():
                m = inb & s["dyn_mask"]
                if m.any():
                    epes_dyn.append(float(err[m].mean()))
                if "noc_mask" in s:
                    mv = inb & s["dyn_mask"] & s["noc_mask"]
                    mo = inb & s["dyn_mask"] & ~s["noc_mask"]
                    if mv.any():
                        epes_dyn_vis.append(float(err[mv].mean()))
                    if mo.any():
                        epes_dyn_occ.append(float(err[mo].mean()))

        if do_depth:
            sigma = np.asarray(disp_fn(img_c[None]))[0, ..., 0]
            # mirror the reference eval chain (eval_tasks.test_eigen_depth):
            # sigma trains as depth; infer_depth bounds it, eval re-inverts
            disp = 1.0 / (0.01 + (10.0 - 0.01) * sigma)
            pred_depth = 1.0 / (disp + 1e-4)
            gt_depth = s["depth"]
            m = s["valid"] & (gt_depth > 1e-3) & (gt_depth < 80.0)
            pd, gd = pred_depth[m], gt_depth[m]
            scale = np.median(gd) / np.median(pd)
            pd = pd * scale  # median scaling (test protocol)
            pd = np.clip(pd, 1e-3, 80.0)
            errs = compute_errors(gd, pd)
            absrel.append(float(errs[0]))
            a1.append(float(errs[4]))
            scene_scales.append(float(scale))
            scene_absrel.append(float(errs[0]))

        if pose_fn is not None and "R_bwd" in s:
            img_l = s["img_l"].astype(np.float32) / 255.0
            stacked = np.concatenate([img_l, img_c, img_r], axis=-1)
            pvecs = np.asarray(pose_fn(stacked[None]))[0]  # [2,6]: bwd, fwd
            snippet = np.stack(
                [pvecs[0], np.zeros(6, np.float32), pvecs[1]]
            )
            pred_warps = np.asarray(
                pose_vec2mat(jax.numpy.asarray(snippet))
            ).astype(np.float64)
            gt_warps = np.stack(
                [
                    np.concatenate([s["R_bwd"], s["t_bwd"].reshape(3, 1)], -1),
                    np.eye(3, 4),
                    np.concatenate([s["R_fwd"], s["t_fwd"].reshape(3, 1)], -1),
                ]
            )
            gt_snip = _snippet_from_warps(gt_warps)
            ate, re = compute_snippet_pose_error(
                gt_snip, _snippet_from_warps(pred_warps)
            )
            ate0, re0 = _zero_motion_error(gt_snip)
            ates.append(float(ate))
            res.append(float(re))
            ates_zero.append(float(ate0))
            res_zero.append(float(re0))
    out = {}
    if epes:
        out["flow_epe"] = float(np.mean(epes))
    if epes_noc:
        out["flow_epe_noc"] = float(np.mean(epes_noc))
    if epes_dyn:
        out["flow_epe_dyn"] = float(np.mean(epes_dyn))
    if epes_occ:
        out["flow_epe_occ"] = float(np.mean(epes_occ))
    if epes_dyn_vis:
        out["flow_epe_dyn_vis"] = float(np.mean(epes_dyn_vis))
    if epes_dyn_occ:
        out["flow_epe_dyn_occ"] = float(np.mean(epes_dyn_occ))
    if absrel:
        out["depth_absrel"] = float(np.mean(absrel))
        out["depth_a1"] = float(np.mean(a1))
        out["depth_scales"] = [round(s, 4) for s in scene_scales]
        out["depth_absrel_scenes"] = [round(a, 4) for a in scene_absrel]
    if ates:
        out["pose_ate"] = float(np.mean(ates))
        out["pose_re"] = float(np.mean(res))
        out["pose_ate_zero"] = float(np.mean(ates_zero))
        out["pose_re_zero"] = float(np.mean(res_zero))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/synth_world")
    ap.add_argument("--out", default="/tmp/synth_run")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 832])
    ap.add_argument("--eval_every", type=int, default=500)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--image_every", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--grad_clip", type=float, default=0.0)
    ap.add_argument("--fix_flow", action="store_true")
    ap.add_argument("--fix_depth", action="store_true")
    ap.add_argument("--fix_pose", action="store_true")
    # the reference's curriculum is flow -> depth -> geom with staged init
    # (/root/reference/train.py:36-55); geom-from-scratch was observed to
    # learn far slower (flow EPE flat over 1k steps while SSIM creeps down)
    ap.add_argument("--mode", default="geom", choices=["flow", "depth", "geom"])
    ap.add_argument("--graft_flow", default="", help="flow-stage ckpt dir")
    ap.add_argument("--graft_depth", default="", help="depth-stage ckpt dir")
    ap.add_argument("--n_movers", type=int, default=0,
                    help="moving billboards per scene when auto-generating")
    ap.add_argument("--resume", action="store_true",
                    help="restore the latest <out>/ckpt and continue")
    ap.add_argument("--max_steps_per_proc", type=int, default=0,
                    help="exit cleanly after this many steps (0 = no cap). "
                         "The axon device relay leaks ~15-20 MB of host "
                         "memory per h2d batch transfer (measured: 100 "
                         "transfers of a 15 MB uint8 batch retain ~1.5 GB), "
                         "so multi-hour runs recycle the process every few "
                         "thousand steps via --resume; scripts/run_stage.sh "
                         "wraps the loop")
    ap.add_argument("--min_fps", type=float, default=5.0,
                    help="slow-attach watchdog: if three consecutive fps "
                         "reports (past step 100) fall below this, checkpoint "
                         "and exit so the run_stage.sh loop re-attaches. A "
                         "fresh axon relay attach occasionally comes up ~20x "
                         "slow (48 -> 2.2 fps, measured r4) and stays slow "
                         "for the life of the process; re-attaching fixes it. "
                         "0 disables (use for configs legitimately <5 fps)")
    ap.add_argument("--device_data", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="hold the whole prepared set in HBM and ship only "
                         "per-step indices (see the relay-leak note)")
    ap.add_argument("--flow_occ_impl", default="splat_nn",
                    choices=["splat", "splat_nn", "splat_nn_half", "diff_weights"],
                    help="flow-mode occlusion model (A/B: PARITY.md)")
    ap.add_argument("--enable_losses", default="",
                    help="comma list from {triangle,pnp,eight_point,"
                         "depth_ssim,depth_consis} to switch on")
    ap.add_argument("--loss_base_scale", type=int, default=0,
                    help="half-resolution loss dial (A/B: TRAINING.md)")
    ap.add_argument("--flow_occ_switch_step", type=int, default=0,
                    help="flow mode: switch to flow_occ_impl=splat at this "
                         "step (occlusion schedule, config.flow_occ_switch_step)")
    ap.add_argument("--set", action="append", default=[],
                    help="extra Config overrides, key=value (repeatable); "
                         "values parsed as int/float/bool when they look it")
    args = ap.parse_args()

    def _parse_val(v):
        if v.lower() in ("true", "false"):
            return v.lower() == "true"
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                pass
        return v

    extra = {}
    for kv in args.set:
        k, _, v = kv.partition("=")
        extra[k] = _parse_val(v)

    if not os.path.exists(os.path.join(args.data, "train.txt")):
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from synth_world import generate

        generate(args.data, n_train=240, n_eval=8, hw=tuple(args.hw),
                 n_movers=args.n_movers)

    os.makedirs(args.out, exist_ok=True)
    h, w = args.hw
    cfg = Config(
        img_hw=(h, w),
        mode=args.mode,
        compute_dtype="bfloat16",
        batch_size=args.batch,
        lr=args.lr,
        grad_clip_norm=args.grad_clip,
        fix_flow=args.fix_flow,
        fix_depth=args.fix_depth,
        fix_pose=args.fix_pose,
        num_iterations=args.steps,
        model_dir=args.out,
        flow_occ_impl=args.flow_occ_impl,
        loss_base_scale=args.loss_base_scale,
        flow_occ_switch_step=args.flow_occ_switch_step,
        **{
            f"enable_{k.strip()}": True
            for k in args.enable_losses.split(",")
            if k.strip()
        },
        **extra,
    )
    from unsupervised_depth_opticalflow_egomotion_tpu.utils import opt_layout_tag

    model, state = init_state(cfg, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(os.path.join(args.out, "ckpt"))
    layout = opt_layout_tag(cfg.fix_flow, cfg.fix_depth, cfg.fix_pose)
    ckpt_meta = {"opt_layout": layout, "mode": cfg.mode, "img_hw": list(cfg.img_hw)}
    resumed_step = 0
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state, expect_opt_layout=layout)
        resumed_step = int(state.step)
        print(f"resumed from step {resumed_step}")
    # staged hand-off: take the flow nets from the flow-stage checkpoint and
    # the depth/pose nets from the depth-stage one (train.py:36-55 semantics)
    from unsupervised_depth_opticalflow_egomotion_tpu.utils import graft_params

    for stage_dir, keys in (
        (args.graft_flow, ("fpyramid", "pwc")),
        (args.graft_depth, ("depth_net", "pose_net")),
    ):
        if stage_dir and not resumed_step:
            # template-free params restore: works whatever freezing flags
            # the donor stage was trained with (opt_state layouts differ;
            # utils/checkpoint.py restore_params)
            donor_params = CheckpointManager(stage_dir).restore_params()
            subset = {k: donor_params[k] for k in keys if k in donor_params}
            state = state.replace(params=graft_params(state.params, subset))
            print(f"grafted {keys} from {stage_dir}")
    tx = make_optimizer(cfg, state.params)
    step_fn = make_train_step(model, cfg, tx)

    dataset = KittiPreparedDataset(
        args.data, num_scales=cfg.num_scales, img_hw=cfg.img_hw,
        num_iterations=args.steps * args.batch,
        seed=resumed_step,  # a recycled process draws a fresh sample stream
        cache_decoded_bytes=1 << 30,  # 1-core host: decode dominates otherwise
        uint8_images=True,  # 4x smaller relay transfer; normalized on device
    )

    # Device-resident dataset (default for this synthetic world): the whole
    # prepared set is ~460 MB of uint8 in HBM, so each step ships only [B]
    # sample indices + flip bits instead of a 15 MB batch. This sidesteps
    # BOTH the relay's per-transfer host-memory leak (see
    # --max_steps_per_proc) and its throughput decay with cumulative bytes
    # (measured: training fps 30 -> 3 over ~20k full-batch transfers in one
    # session), and matches the loader's exact augmentation semantics
    # (per-index seeded resampling + whole-stack flip).
    device_loader = None
    if args.device_data:
        # raw stacks without augmentation (dataset[i] applies the
        # virtual-index resampling/flip; we replicate those on indices)
        import cv2

        raws = []
        for rec in dataset.data_list:
            raw = cv2.imread(rec["image_file"])
            h_orig = raw.shape[0] // 3
            hh, ww = cfg.img_hw
            raws.append(
                np.concatenate(
                    [
                        cv2.resize(raw[k * h_orig : (k + 1) * h_orig], (ww, hh))
                        for k in range(3)
                    ],
                    axis=0,
                )
            )
        data_dev = jax.numpy.asarray(np.stack(raws))  # [N, 3H, W, 3] uint8
        K0, Kinv0 = dataset[0][1], dataset[0][2]  # one shared calib
        K_dev = jax.numpy.asarray(np.tile(K0[None], (args.batch, 1, 1, 1)))
        Kinv_dev = jax.numpy.asarray(np.tile(Kinv0[None], (args.batch, 1, 1, 1)))

        @jax.jit
        def gather_batch(data, idx, flip):
            imgs = jax.numpy.take(data, idx, axis=0)
            return jax.numpy.where(
                flip[:, None, None, None], imgs[:, :, ::-1, :], imgs
            )

        def device_batches():
            count = len(raws)
            vidx = 0
            while True:
                idxs, flips = [], []
                for _ in range(args.batch):
                    r = np.random.RandomState(dataset.seed + vidx)
                    idxs.append(r.randint(count))
                    flips.append(r.rand() > 0.5)
                    vidx += 1
                yield (
                    gather_batch(
                        data_dev,
                        jax.numpy.asarray(np.asarray(idxs, np.int32)),
                        jax.numpy.asarray(np.asarray(flips)),
                    ),
                    K_dev,
                    Kinv_dev,
                )

        device_loader = device_batches()
        print(f"device-resident dataset: {len(raws)} stacks, "
              f"{data_dev.nbytes >> 20} MB HBM")

    loader = BatchLoader(
        dataset, args.batch, shuffle=True, num_workers=2, seed=resumed_step
    ) if device_loader is None else device_loader

    eval_model = build_model(cfg.replace(compute_dtype="float32"))
    flow_fn_v, disp_fn_v, pose_fn_v = eval_tasks.make_inference_fns(eval_model)

    mask_fn = None
    if args.mode == "geom":

        @jax.jit
        def mask_fn(variables, images, K_ms, K_inv_ms):
            # fixed sampling key: forward_geom requires an explicit rng when
            # the RANSAC losses are enabled, and a constant one is fine for
            # mask statistics (we read aux masks, not the sampled losses)
            _, aux = eval_model.apply(
                variables, images, K_ms, K_inv_ms,
                rng=jax.random.PRNGKey(0), train=False,
                method=eval_model.forward_geom, with_masks=True,
            )
            return aux

    eval_set = load_eval_set(args.data)
    curves = open(os.path.join(args.out, "curves.jsonl"), "a", buffering=1)

    rng = jax.random.fold_in(jax.random.PRNGKey(1), resumed_step)
    step = resumed_step
    slow_reports = 0
    t_last = time.time()
    last_batch = None
    occ_switch = (
        cfg.flow_occ_switch_step
        if cfg.mode == "flow" and cfg.flow_occ_impl != "splat"
        else 0
    )
    for batch_np in loader:
        if step >= args.steps:
            break
        if occ_switch and step >= occ_switch:
            occ_switch = 0
            cfg_tail = cfg.replace(flow_occ_impl="splat")
            step_fn = make_train_step(build_model(cfg_tail), cfg_tail, tx)
            print(f"[{step}] occlusion schedule: switching to flow_occ_impl=splat")
        if args.max_steps_per_proc and step - resumed_step >= args.max_steps_per_proc:
            print(f"[recycle] reached {args.max_steps_per_proc} steps this "
                  f"process at step {step}; checkpointing and exiting")
            break
        batch = tuple(jax.numpy.asarray(x) for x in batch_np)
        last_batch = (batch, batch_np)
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        step += 1

        if step % args.log_every == 0 or step == 1:
            scalars = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t_last
            t_last = time.time()
            fps = args.log_every * args.batch / dt if step > 1 else 0.0
            rec = {"step": step, "fps": round(fps, 1), **{k: round(v, 5) for k, v in scalars.items()}}
            if not np.isfinite(scalars["loss_total"]):
                print(f"[{step}] NON-FINITE LOSS: {scalars}")
                curves.write(json.dumps(rec) + "\n")
                break
            print(f"[{step}/{args.steps}] total={scalars['loss_total']:.4f} fps={fps:.1f}")
            curves.write(json.dumps(rec) + "\n")
            if args.min_fps and step - resumed_step > 100:
                slow_reports = slow_reports + 1 if fps < args.min_fps else 0
                if slow_reports >= 3:
                    print(f"[watchdog] fps<{args.min_fps} for 3 reports at "
                          f"step {step}; checkpointing and exiting to re-attach")
                    break

        variables = None
        if step % args.eval_every == 0 or step == args.steps:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            m = synth_eval(
                eval_set,
                lambda a, b: flow_fn_v(variables, a, b),
                lambda a: disp_fn_v(variables, a),
                do_flow=args.mode in ("flow", "geom"),
                do_depth=args.mode in ("depth", "geom"),
                pose_fn=(
                    (lambda x: pose_fn_v(variables, x))
                    if args.mode in ("depth", "geom")
                    else None
                ),
            )
            rec = {"step": step, "eval": m}
            if mask_fn is not None:
                aux = jax.device_get(mask_fn(variables, *batch))
                rec["masks"] = {
                    "occ_mean": float(np.mean(aux["occ_fwd_mask"])),
                    "dyn_mean": float(np.mean(aux["dyna_fwd_mask"])),
                    "valid_mean": float(np.mean(aux["valid_fwd_mask"])),
                    "fused_mean": float(np.mean(aux["fwd_mask"])),
                    "tex_mean": float(np.mean(aux["texture_mask_fwd"])),
                }
            print(f"[EVAL {step}] {m}" + (f" masks={rec['masks']}" if "masks" in rec else ""))
            curves.write(json.dumps(rec) + "\n")

        if mask_fn is not None and step % args.image_every == 0:
            from unsupervised_depth_opticalflow_egomotion_tpu.visualize import (
                dump_mask_pack,
            )

            if variables is None:
                variables = {"params": state.params, "batch_stats": state.batch_stats}
                aux = jax.device_get(mask_fn(variables, *batch))
            hh = batch_np[0].shape[1] // 3
            center = np.asarray(batch_np[0][0, hh : 2 * hh])
            if center.dtype == np.uint8:
                center = center.astype(np.float32) / 255.0
            dump_mask_pack(
                aux, center, os.path.join(args.out, "images"), step, None,
            )
        if step % 1000 == 0:
            ckpt.save(step, jax.device_get(state), meta=ckpt_meta)

    ckpt.save(step, jax.device_get(state), meta=ckpt_meta)
    curves.close()
    print("done", step)


if __name__ == "__main__":
    main()
