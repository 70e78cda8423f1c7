"""Joint depth / optical-flow / ego-motion model and its loss graphs.

One Flax module hosts the four sub-networks and exposes the three training
objectives as methods (selected statically at trace time, so each mode jits to
its own tight XLA program):

- ``forward_flow``: PWC flow with forward-splat occlusion masking -- the
  scheme the reference defines but never ships working
  (model_flow.py:33-39's transformerFwd; the published soft diff-weight
  variant crashes AND is degenerate, see the deviation note in the method)
- ``forward_depth``: depth+pose photometric objective
  (/root/reference/core/networks/model_depth.py:272-337)
- ``forward_geom``: the flagship joint objective with dynamic-region masks,
  epipolar distance maps and cross-task consistency
  (/root/reference/core/networks/model_geometry.py:768-953)

Loss packs are dicts of per-batch-item [B] vectors; the train step applies
config weights and means. Optional losses the reference ships disabled
(depth_ssim/depth_consis/triangle -- model_geometry.py:891-951) are implemented
and gated by static flags, defaulting to the reference's live configuration.

NOTE (preserved reference behaviour): the sigmoid disp pyramid is used
directly as "depth" inside inverse_warp2 (model_geometry.py:798-801); eval
inverts consistently (test.py:95).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import losses as L
from ..ops import masks as M
from ..ops.geometry import disp2depth, fundamental_from_pose, projection_matrices
from ..ops.interp import image_pyramid, resize_area
from ..ops.inverse_warp_multi import multiscale_recon_dynamic, multiscale_reconstruction
from ..ops.pnp import batched_pnp
from ..ops.ransac import batched_ransac_fundamental
from ..ops.sampling import sample_matches
from ..ops.splat import occlusion_mask_from_flow
from ..ops.triangulation import midpoint_triangulate, register_depth, reproject
from ..ops.warp import warp_flow
from .depth_net import DepthNet
from .feature_pyramid import FeaturePyramid
from .pose_net import PoseNet
from .pwc_decoder import PWCDecoder


def split_stack(images: jax.Array, dtype=None):
    """Vertically stacked 3-frame image [B,3H,W,3] -> (img_l, img, img_r).

    With ``dtype`` the frames are cast (bf16 on the training path: image
    values tolerate it and it halves the bandwidth of every warp gather and
    photometric pass; coordinates and loss accumulations stay f32). uint8
    input (the loader's uint8_images fast path -- 4x smaller host->device
    transfer) is normalized to [0,1] here on device.
    """
    if images.dtype == jnp.uint8:
        tgt = dtype if dtype is not None else jnp.float32
        # normalize in f32 then cast: bit-identical to the loader's host-side
        # (img/255).astype(f32) path under every compute dtype
        images = (images.astype(jnp.float32) / 255.0).astype(tgt)
    elif dtype is not None:
        images = images.astype(dtype)
    h = images.shape[1] // 3
    return images[:, :h], images[:, h : 2 * h], images[:, 2 * h :]


def split_stack_raw(images: jax.Array):
    """Raw uint8 frame triplet if the stack is uint8, else None.

    The full-resolution warp gathers can sample raw uint8 rows (half the
    gather bytes of bf16) and fold the 1/255 normalization into the bilinear
    weights (ops/warp.py); this keeps the unnormalized frames available next
    to split_stack's normalized ones.
    """
    if images.dtype != jnp.uint8:
        return None
    h = images.shape[1] // 3
    return images[:, :h], images[:, h : 2 * h], images[:, 2 * h :]


def _split3(x: jax.Array):
    b = x.shape[0] // 3
    return x[:b], x[b : 2 * b], x[2 * b :]


class JointModel(nn.Module):
    num_scales: int = 3
    num_input_frames: int = 3
    flow_consist_alpha: float = 0.01
    flow_consist_beta: float = 0.5
    rigid_thres: float = 0.5
    inlier_thres: float = 0.1
    geometric_ratio: float = 0.3
    geometric_num: int = 6000
    pose_beta: float = 1.0
    enable_depth_ssim: bool = False
    enable_depth_consis: bool = False
    enable_triangle: bool = False
    enable_pnp: bool = False
    enable_eight_point: bool = False
    ransac_iters: int = 100
    remat: bool = True
    packed_convs: bool = True
    packed_encoder: bool = False
    packed_stem: bool = False
    encoder_int8: bool = False
    # mean-normalized disparity smoothness (monodepth2-style): the lever
    # targeted at the measured scale-drift <-> AbsRel co-movement
    # (TRAINING.md r5); off = reference semantics
    depth_smooth_norm: bool = False
    corr_impl: str = "xla"
    # Flow-mode occlusion model: "splat" = forward-splat masks (the scheme
    # the reference defines via transformerFwd but never ships working --
    # the live default, see the deviation note in forward_flow); or
    # "diff_weights" = the faithful soft diff-weight scheme of
    # model_flow.py:105-138 (parity-tested against the reference's
    # internals in tests/test_parity_flow.py; known-degenerate as a
    # training objective, kept for measured A/B comparison).
    flow_occ_impl: str = "splat"
    # Half-resolution loss dial: base the WHOLE loss pyramid loss_base_scale
    # octaves below the input resolution. The networks still run at full
    # input resolution (so inference is unchanged and the flow/disp heads see
    # the same receptive fields), but every warp gather, mask, and loss term
    # evaluates on the downscaled grid: at 1 the full-res warp gathers and the
    # full-res decoder head vanish from the train step (XLA prunes the unused
    # scale-0 disp head). The reference always trains at loss scale 0
    # (model_geometry.py:802-846 evaluates the loss pyramid from full res).
    # Measured (TRAINING.md geom_fixflow_ls1_r4, 8k-step fixflow recipe):
    # 1.56x train throughput (93.1 vs 59.6 fps/chip) with pose and frozen
    # flow unaffected but a real depth cost (AbsRel +22%, a1 -28%) -- a
    # dial for pose/flow-dominated phases, not a free speedup.
    loss_base_scale: int = 0
    # Weight of the dynamic-region (non-rigid) photometric term relative to
    # the rigid-region one. The reference hard-codes 2x (model_geometry.py's
    # dyna-masked pixel loss is added at weight 2 alongside the rigid one);
    # configurable here for the moving-region A/B (TRAINING.md).
    dyna_photo_weight: float = 2.0
    dtype: Any = jnp.float32

    def setup(self):
        # Rematerialize the conv stacks: the joint graph holds 3B-batch
        # activations for three networks at 256x832; recomputing them in the
        # backward keeps peak HBM under the chip budget (FLOPs are cheap on
        # the MXU relative to HBM here).
        depth_cls = nn.remat(DepthNet, static_argnums=(2,)) if self.remat else DepthNet
        fpyr_cls = nn.remat(FeaturePyramid) if self.remat else FeaturePyramid
        pwc_cls = nn.remat(PWCDecoder, static_argnums=(3,)) if self.remat else PWCDecoder
        if self.loss_base_scale and self.loss_base_scale + self.num_scales > 4:
            raise ValueError(
                "loss_base_scale + num_scales must be <= 4 (the PWC decoder "
                f"emits 4 flow scales); got {self.loss_base_scale} + {self.num_scales}"
            )
        self.depth_net = depth_cls(
            num_scales=self.num_scales,
            packed=self.packed_convs,
            packed_encoder=self.packed_encoder,
            packed_stem=self.packed_stem,
            encoder_int8=self.encoder_int8,
            extra_head_scales=self.loss_base_scale,
            dtype=self.dtype,
        )
        self.pose_net = PoseNet(
            num_input_frames=self.num_input_frames, dtype=self.dtype
        )
        self.fpyramid = fpyr_cls(packed=self.packed_convs, dtype=self.dtype)
        self.pwc = pwc_cls(corr_impl=self.corr_impl, dtype=self.dtype)

    # ------------------------------------------------------------------ infer
    def infer_depth(self, img):
        """Bounded depth from the full-res disp head (model_geometry.py:289-292)."""
        disp_list = self.depth_net(img, False)
        return disp2depth(disp_list[0])

    def infer_disp(self, img):
        """Raw full-res sigmoid disparity."""
        return self.depth_net(img, False)[0]

    def inference_flow(self, img1, img2):
        """Full-res forward flow (model_geometry.py:294-298)."""
        hw = (img1.shape[1], img1.shape[2])
        f1, f2 = self.fpyramid(img1), self.fpyramid(img2)
        return self.pwc(f1, f2, hw)[0]

    def infer_pose(self, imgs):
        """[B, N-1, 6] pose vectors from channel-stacked frames."""
        return self.pose_net(imgs)

    # ------------------------------------------------------------- flow mode
    def forward_flow(self, images, K_ms, K_inv_ms, rng=None, train: bool = True):
        # K pyramids are genuinely unused (the flow objective is purely
        # photometric, model_flow.py:209-261). rng/train are accepted for
        # signature parity with forward_geom and threaded below so a future
        # BN/dropout in the flow nets cannot be silently ignored; today the
        # fpyramid/pwc stacks are conv+LeakyReLU only (asserted by
        # tests/test_models.py: no batch_stats collection in this path).
        del K_ms, K_inv_ms, rng, train
        ls = self.loss_base_scale
        raw = split_stack_raw(images) if ls == 0 else None
        img_l, img, img_r = split_stack(images, self.dtype)
        hw = (img.shape[1], img.shape[2])

        # One 3B-batch encoder pass + one 2B-batch decoder pass: larger
        # batched convs keep the MXU fed instead of three/two small launches.
        feats_all = self.fpyramid(jnp.concatenate([img_l, img, img_r], axis=0))
        feat_l, feat, feat_r = zip(*(_split3(f) for f in feats_all))
        feat_cc = tuple(jnp.concatenate([c, c], axis=0) for c in feat)
        feat_lr = tuple(jnp.concatenate(p, axis=0) for p in zip(feat_l, feat_r))
        flows_both = self.pwc(feat_cc, feat_lr, hw)[ls:]
        flows_bwd = [f[: img.shape[0]] for f in flows_both]
        flows_fwd = [f[img.shape[0] :] for f in flows_both]

        if ls:
            lhw = (hw[0] >> ls, hw[1] >> ls)
            img_l = resize_area(img_l, lhw)
            img = resize_area(img, lhw)
            img_r = resize_area(img_r, lhw)
        # The flow objective uses area pyramids (model_flow.py:58-64).
        n = len(flows_fwd)
        img_l_pyr = image_pyramid(img_l, n, mode="area")
        img_pyr = image_pyramid(img, n, mode="area")
        img_r_pyr = image_pyramid(img_r, n, mode="area")

        bsz = img.shape[0]
        # scale 0 samples the raw uint8 frames when available (half the
        # gather row bytes; normalization folded into the bilinear weights)
        warped2 = []
        for s, (il, ir, fb, ff) in enumerate(
            zip(img_l_pyr, img_r_pyr, flows_bwd, flows_fwd)
        ):
            src = (
                jnp.concatenate([raw[0], raw[2]], 0)
                if s == 0 and raw is not None
                else jnp.concatenate([il, ir], 0)
            )
            warped2.append(
                warp_flow(src, jnp.concatenate([fb, ff], 0), True,
                          out_dtype=self.dtype, src_is_data=True)
            )
        warped_from_l = [x[:bsz] for x in warped2]
        warped_from_r = [x[bsz:] for x in warped2]
        ns = self.num_scales

        if self.flow_occ_impl == "diff_weights":
            # Faithful reproduction of the reference flow objective
            # (model_flow.py:209-261 with survey defects 1-2 patched):
            # soft diff-weight masks, precomputed-residual pixel loss,
            # consis masked by (1 - weight_fwd).
            diff_bwd, diff_fwd, w_bwd, w_fwd = M.diff_weights(
                warped_from_l, img_pyr, warped_from_r
            )
            return {
                "loss_flow_pixel": L.masked_diff_loss(diff_fwd[:ns], w_fwd[:ns])
                + L.masked_diff_loss(diff_bwd[:ns], w_bwd[:ns]),
                "loss_flow_ssim": L.ssim_loss(img_pyr[:ns], warped_from_r[:ns], w_fwd[:ns])
                + L.ssim_loss(img_pyr[:ns], warped_from_l[:ns], w_bwd[:ns]),
                "loss_flow_smooth": L.flow_smooth_loss(flows_fwd[:ns], img_pyr[:ns])
                + L.flow_smooth_loss(flows_bwd[:ns], img_pyr[:ns]),
                "loss_flow_consis": L.flow_consis_loss(
                    flows_fwd[:ns], flows_bwd[:ns], w_fwd[:ns]
                ),
            }

        # DELIBERATE DEVIATION from model_flow.py's soft diff-weights
        # (2*exp(-(w-0.5)^2/0.03), model_flow.py:105-138): that objective was
        # never runnable as published (survey defects 1-2) and is degenerate
        # -- the soft weights reach 2.0, so the consistency loss's (1 - occ)
        # mask goes NEGATIVE (observed loss_flow_consis = -10.8 in training),
        # and any comparative photometric mask (incl. the geom-mode hard
        # threshold) is winner-take-all between the two directions: once one
        # direction fits, the other's mask goes to zero image-wide, its
        # gradient dies, and the shared decoder emits the wrong-sign flow
        # (measured: pixel-only training converges to +2 on a -2 ground
        # truth with near-zero loss). The occlusion model here is the one the
        # reference DEFINES for this purpose but never ships working
        # (get_occlusion_mask_from_flow, model_flow.py:33-39 = TrianFlow's
        # transformerFwd): forward-splat ones along the approximate inverse
        # flow (-flow, exact away from occlusion boundaries for our
        # center->side pairs); pixels receiving no mass are occluded. The
        # mask is geometric, direction-independent, and all-ones at the
        # zero-flow init -- a natural warm start.
        occ_taps = {
            "splat_nn": "nearest",
            "splat_nn_half": "nearest_half",
            "splat_xla": "bilinear_xla",  # forced scatter-add (A/B escape)
        }.get(self.flow_occ_impl, "bilinear")
        occ_fwd = [occlusion_mask_from_flow(-f, occ_taps) for f in flows_fwd]
        occ_bwd = [occlusion_mask_from_flow(-f, occ_taps) for f in flows_bwd]
        valid_fwd = [
            1.0 - jnp.all(wr == 0, axis=-1, keepdims=True).astype(wr.dtype)
            for wr in warped_from_r
        ]
        valid_bwd = [
            1.0 - jnp.all(wl == 0, axis=-1, keepdims=True).astype(wl.dtype)
            for wl in warped_from_l
        ]
        mask_fwd = M.fuse_masks(valid_fwd, occ_fwd)
        mask_bwd = M.fuse_masks(valid_bwd, occ_bwd)

        # Losses run over num_scales scales even though 4 flows are predicted
        # (model_flow.py loops range(self.num_scales)).
        loss_pack = {
            "loss_flow_pixel": L.photometric_loss(img_pyr[:ns], warped_from_l[:ns], mask_bwd[:ns])
            + L.photometric_loss(img_pyr[:ns], warped_from_r[:ns], mask_fwd[:ns]),
            "loss_flow_ssim": L.ssim_loss(img_pyr[:ns], warped_from_r[:ns], mask_fwd[:ns])
            + L.ssim_loss(img_pyr[:ns], warped_from_l[:ns], mask_bwd[:ns]),
            "loss_flow_smooth": L.flow_smooth_loss(flows_fwd[:ns], img_pyr[:ns])
            + L.flow_smooth_loss(flows_bwd[:ns], img_pyr[:ns]),
            "loss_flow_consis": L.flow_consis_loss(flows_fwd[:ns], flows_bwd[:ns], occ_fwd[:ns]),
        }
        return loss_pack

    # ------------------------------------------------------------ depth mode
    def forward_depth(self, images, K_ms, K_inv_ms, train: bool = True):
        del K_inv_ms
        ls = self.loss_base_scale
        K = K_ms[:, ls]
        img_l, img, img_r = split_stack(images, self.dtype)

        # Single 3B-batch depth pass (BatchNorm statistics are computed over
        # the frame triplet jointly rather than per-frame -- a deliberate
        # batching of the reference's three separate calls).
        disp_all = self.depth_net(
            jnp.concatenate([img_l, img, img_r], axis=0), train
        )[ls : ls + self.num_scales]
        disp_l, disp, disp_r = zip(*(_split3(d) for d in disp_all))
        disp_l, disp, disp_r = list(disp_l), list(disp), list(disp_r)

        poses = self.pose_net(jnp.concatenate([img_l, img, img_r], axis=-1))
        pose_fwd, pose_bwd = poses[:, 1], poses[:, 0]

        if ls:
            lhw = (img.shape[1] >> ls, img.shape[2] >> ls)
            img_l = resize_area(img_l, lhw)
            img = resize_area(img, lhw)
            img_r = resize_area(img_r, lhw)
        img_pyr = image_pyramid(img, self.num_scales)
        img_l_pyr = image_pyramid(img_l, self.num_scales)
        img_r_pyr = image_pyramid(img_r, self.num_scales)

        rec_l, valid_l, pdepth_l, cdepth_l = multiscale_reconstruction(
            img_l, K, disp, disp_l, pose_bwd, sample_ref_depth=self.enable_depth_consis
        )
        rec_r, valid_r, pdepth_r, cdepth_r = multiscale_reconstruction(
            img_r, K, disp, disp_r, pose_fwd, sample_ref_depth=self.enable_depth_consis
        )

        tex_bwd = M.texture_masks(img_pyr, rec_l, img_l_pyr)
        tex_fwd = M.texture_masks(img_pyr, rec_r, img_r_pyr)
        mask_bwd = M.fuse_masks(valid_l, tex_bwd)
        mask_fwd = M.fuse_masks(valid_r, tex_fwd)

        zero = jnp.zeros((images.shape[0],), jnp.float32)
        loss_pack = {
            "loss_depth_pixel": L.photometric_loss(img_pyr, rec_l, mask_bwd)
            + L.photometric_loss(img_pyr, rec_r, mask_fwd),
            "loss_depth_smooth": L.disp_smooth_loss(img, disp, self.depth_smooth_norm)
            + L.disp_smooth_loss(img_l, disp_l, self.depth_smooth_norm)
            + L.disp_smooth_loss(img_r, disp_r, self.depth_smooth_norm),
            "loss_depth_ssim": (
                L.ssim_loss(img_pyr, rec_l, mask_bwd) + L.ssim_loss(img_pyr, rec_r, mask_fwd)
                if self.enable_depth_ssim
                else zero
            ),
            "loss_depth_consis": (
                L.depth_consis_loss(pdepth_l, cdepth_l, mask_bwd)
                + L.depth_consis_loss(pdepth_r, cdepth_r, mask_fwd)
                if self.enable_depth_consis
                else zero
            ),
        }
        return loss_pack

    # ------------------------------------------------------------- geom mode
    def forward_geom(
        self, images, K_ms, K_inv_ms, rng=None, train: bool = True, with_masks: bool = False
    ):
        ls = self.loss_base_scale
        # K at the loss base scale: the loader's K pyramid entry ls is the
        # intrinsics of the (H/2^ls, W/2^ls) grid every loss-side quantity
        # lives on when the half-resolution dial is set.
        K, K_inv = K_ms[:, ls], K_inv_ms[:, ls]
        raw = split_stack_raw(images) if ls == 0 else None
        img_l, img, img_r = split_stack(images, self.dtype)
        hw = (img.shape[1], img.shape[2])

        # Depth on all three frames in one 3B-batch pass (BN stats over the
        # triplet jointly -- deliberate batching of the reference's 3 calls).
        # With ls > 0 the pyramid is sliced one octave down; the finer heads
        # feed nothing and XLA prunes their decoder segment from the step.
        disp_all = self.depth_net(
            jnp.concatenate([img_l, img, img_r], axis=0), train
        )[ls : ls + self.num_scales]
        disp_l, disp, disp_r = zip(*(_split3(d) for d in disp_all))
        disp_l, disp, disp_r = list(disp_l), list(disp), list(disp_r)

        # Pose fwd/bwd from the stacked triplet.
        poses = self.pose_net(jnp.concatenate([img_l, img, img_r], axis=-1))
        pose_fwd, pose_bwd = poses[:, 1], poses[:, 0]

        # Flow fwd/bwd from the center frame: one 3B feature pass + one
        # 2B decoder pass.
        feats_all = self.fpyramid(jnp.concatenate([img_l, img, img_r], axis=0))
        feat_l, feat, feat_r = zip(*(_split3(f) for f in feats_all))
        feat_cc = tuple(jnp.concatenate([c, c], axis=0) for c in feat)
        feat_lr = tuple(jnp.concatenate(p, axis=0) for p in zip(feat_l, feat_r))
        flows_both = self.pwc(feat_cc, feat_lr, hw)
        b = img.shape[0]
        flows_bwd = [f[:b] for f in flows_both[ls : ls + self.num_scales]]
        flows_fwd = [f[b:] for f in flows_both[ls : ls + self.num_scales]]

        # Loss-side frames at the base scale; every downstream pyramid, warp,
        # mask and loss is scale-relative, so rebasing here rebases them all.
        if ls:
            lhw = (hw[0] >> ls, hw[1] >> ls)
            img_l = resize_area(img_l, lhw)
            img = resize_area(img, lhw)
            img_r = resize_area(img_r, lhw)
        img_pyr = image_pyramid(img, self.num_scales)
        img_l_pyr = image_pyramid(img_l, self.num_scales)
        img_r_pyr = image_pyramid(img_r, self.num_scales)

        # Both warp directions are batched through the heavy gather ops as one
        # 2B problem (bwd first, fwd second) -- half the gather kernels at
        # twice the size.
        def cat2(a, bb):
            return jnp.concatenate([a, bb], axis=0)

        def split2(x):
            return x[:b], x[b:]

        pose2 = cat2(pose_bwd, pose_fwd)
        K2 = cat2(K, K)
        disp2 = [cat2(d, d) for d in disp]
        disp_lr = [cat2(dl, dr) for dl, dr in zip(disp_l, disp_r)]
        flows2 = [cat2(fb, ff) for fb, ff in zip(flows_bwd, flows_fwd)]

        # Depth/pose reconstruction of the center frame + dynamic-region
        # masks from one shared projection per scale. (Fusing this gather
        # with the flow warp below was tried and reverted: the paths sample
        # different resizings -- area here, bilinear pyramid for flow -- and
        # gather time scales with row bytes, so a shared 6-channel tap table
        # doubled both gathers' cost: 28.9 -> 16.4 fps.)
        rec2, valid_to2, pdepth2, cdepth2, fd2, dyn2, fds2 = multiscale_recon_dynamic(
            cat2(img_l, img_r), K2, disp2, disp_lr, pose2, flows2,
            self.flow_consist_alpha, self.flow_consist_beta,
            sample_ref_depth=self.enable_depth_consis,
            ref_img_u8=cat2(raw[0], raw[2]) if raw is not None else None,
        )
        rec_l, rec_r = zip(*(split2(x) for x in rec2))
        valid_to_l, valid_to_r = zip(*(split2(x) for x in valid_to2))
        if self.enable_depth_consis:
            pdepth_l, pdepth_r = zip(*(split2(x) for x in pdepth2))
            cdepth_l, cdepth_r = zip(*(split2(x) for x in cdepth2))
        else:
            pdepth_l = pdepth_r = cdepth_l = cdepth_r = None

        tex_bwd = M.texture_masks(img_pyr, rec_l, img_l_pyr)
        tex_fwd = M.texture_masks(img_pyr, rec_r, img_r_pyr)

        # Flow reconstruction of the center frame (scale 0 samples raw uint8
        # rows when available -- half the gather bytes).
        warped2 = []
        for s, (il, ir, f2) in enumerate(zip(img_l_pyr, img_r_pyr, flows2)):
            src = cat2(raw[0], raw[2]) if s == 0 and raw is not None else cat2(il, ir)
            warped2.append(warp_flow(src, f2, use_mask=True, out_dtype=self.dtype,
                                     src_is_data=True))
        warped_from_l, warped_from_r = zip(*(split2(x) for x in warped2))
        occ_bwd, occ_fwd, valid_bwd, valid_fwd = M.occlusion_weights(
            warped_from_l, img_pyr, warped_from_r
        )

        # Dynamic-region masks (computed above with the reconstruction).
        fd_bwd, fd_fwd = zip(*(split2(x) for x in fd2))
        dyn_bwd, dyn_fwd = zip(*(split2(x) for x in dyn2))
        fds_bwd, fds_fwd = zip(*(split2(x) for x in fds2))
        fd_bwd, fd_fwd = list(fd_bwd), list(fd_fwd)
        dyn_bwd, dyn_fwd = list(dyn_bwd), list(dyn_fwd)

        # Epipolar distance maps + rigid masks (top scale).
        dist2 = M.epipolar_map(pose2, flows2[0], K2, cat2(K_inv, K_inv))
        dist_bwd, dist_fwd = split2(dist2)
        rigid_bwd, inlier_bwd, _ = M.rigid_masks(dist_bwd, self.rigid_thres, self.inlier_thres)
        rigid_fwd, inlier_fwd, _ = M.rigid_masks(dist_fwd, self.rigid_thres, self.inlier_thres)

        # Mask fusion (model_geometry.py:847-864).
        fwd_mask = M.fuse_masks(valid_fwd, occ_fwd, dyn_fwd)
        bwd_mask = M.fuse_masks(valid_bwd, occ_bwd, dyn_bwd)
        fwd_mask_tex = M.fuse_masks(fwd_mask, tex_fwd)
        bwd_mask_tex = M.fuse_masks(bwd_mask, tex_bwd)
        fwd_valid_occ = M.fuse_masks(valid_fwd, occ_fwd)
        bwd_valid_occ = M.fuse_masks(valid_bwd, occ_bwd)
        fwd_vo_rigid = M.fuse_masks(fwd_valid_occ, dyn_fwd)
        bwd_vo_rigid = M.fuse_masks(bwd_valid_occ, dyn_bwd)
        fwd_vo_dyna = M.fuse_masks(fwd_valid_occ, [1 - m for m in dyn_fwd])
        bwd_vo_dyna = M.fuse_masks(bwd_valid_occ, [1 - m for m in dyn_bwd])

        zero = jnp.zeros((images.shape[0],), jnp.float32)
        loss_pack = {
            "loss_depth_pixel": L.photometric_loss(img_pyr, rec_l, bwd_mask_tex)
            + L.photometric_loss(img_pyr, rec_r, fwd_mask_tex),
            "loss_depth_ssim": (
                L.ssim_loss(img_pyr, rec_l, bwd_mask_tex)
                + L.ssim_loss(img_pyr, rec_r, fwd_mask_tex)
                if self.enable_depth_ssim
                else zero
            ),
            "loss_depth_smooth": L.disp_smooth_loss(img, disp, self.depth_smooth_norm)
            + L.disp_smooth_loss(img_l, disp_l, self.depth_smooth_norm)
            + L.disp_smooth_loss(img_r, disp_r, self.depth_smooth_norm),
            "loss_depth_consis": (
                L.depth_consis_loss(pdepth_l, cdepth_l, bwd_mask_tex)
                + L.depth_consis_loss(pdepth_r, cdepth_r, fwd_mask_tex)
                if self.enable_depth_consis
                else zero
            ),
            "loss_flow_pixel": L.photometric_loss(img_pyr, warped_from_l, bwd_vo_rigid)
            + L.photometric_loss(img_pyr, warped_from_r, fwd_vo_rigid)
            + self.dyna_photo_weight
            * L.photometric_loss(img_pyr, warped_from_l, bwd_vo_dyna)
            + self.dyna_photo_weight
            * L.photometric_loss(img_pyr, warped_from_r, fwd_vo_dyna),
            "loss_flow_ssim": L.ssim_loss(img_pyr, warped_from_l, bwd_valid_occ)
            + L.ssim_loss(img_pyr, warped_from_r, fwd_valid_occ),
            "loss_flow_smooth": L.flow_smooth_loss(flows_fwd, img_pyr)
            + L.flow_smooth_loss(flows_bwd, img_pyr),
            "loss_flow_consis": L.flow_consis_loss(flows_fwd, flows_bwd, occ_fwd),
            "loss_depth_flow_consis": L.depth_flow_consis_loss(fd_bwd, bwd_mask, 1)
            + L.depth_flow_consis_loss(fd_fwd, fwd_mask, 1),
            "loss_epipolar": L.epipolar_loss(dist_bwd, dyn_bwd[0])
            + L.epipolar_loss(dist_fwd, dyn_fwd[0]),
            "loss_triangle": zero,
            "loss_pnp": zero,
            "loss_eight_point": zero,
        }

        need_samples = self.enable_triangle or self.enable_pnp or self.enable_eight_point
        if need_samples:
            if rng is None:
                # fail loudly: a PRNGKey(0) fallback would make every sampled
                # match set identical across steps and silently bias the
                # geometric losses
                raise ValueError(
                    "forward_geom requires `rng` when triangle/pnp/eight_point "
                    "losses are enabled"
                )
            k_bwd, k_fwd, k8_bwd, k8_fwd = jax.random.split(rng, 4)
            # sample_match(flow[0], disp[0], flow_diff_scores[0])
            # (model_geometry.py:824-826): one sampled set feeds all three
            # geometric losses
            m_bwd, d_bwd = sample_matches(
                k_bwd, flows_bwd[0], disp[0], fds_bwd[0], self.geometric_ratio, self.geometric_num
            )
            m_fwd, d_fwd = sample_matches(
                k_fwd, flows_fwd[0], disp[0], fds_fwd[0], self.geometric_ratio, self.geometric_num
            )
        if self.enable_triangle:
            loss_pack["loss_triangle"] = self._triangle_loss(
                m_bwd, pose_bwd, K, K_inv, disp[0], disp_l[0]
            ) + self._triangle_loss(m_fwd, pose_fwd, K, K_inv, disp[0], disp_r[0])
        if self.enable_pnp:
            loss_pack["loss_pnp"] = self._pnp_loss(
                m_bwd, d_bwd, pose_bwd, K, K_inv
            ) + self._pnp_loss(m_fwd, d_fwd, pose_fwd, K, K_inv)
        if self.enable_eight_point:
            loss_pack["loss_eight_point"] = self._eight_point_loss(
                k8_bwd, m_bwd, pose_bwd, K_inv
            ) + self._eight_point_loss(k8_fwd, m_fwd, pose_fwd, K_inv)

        aux = {}
        if with_masks:
            aux = {
                "occ_fwd_mask": occ_fwd[0],
                "rigid_fwd_mask": rigid_fwd,
                "inlier_fwd_mask": inlier_fwd,
                "dyna_fwd_mask": dyn_fwd[0],
                "valid_fwd_mask": valid_to_r[0],
                "fwd_mask": fwd_mask[0],
                "texture_mask_fwd": tex_fwd[0],
                "pred_disp": disp[0],
                "pred_flow_fwd": flows_fwd[0],
            }
        return loss_pack, aux

    def _pnp_loss(self, match, depth_sampled, pose, K, K_inv):
        """PnP-consistency pose loss (model_geometry.py:473-530).

        3D points are back-projected sampled matches scaled by the sampled
        disp value (the reference feeds ``disp_list[0]`` as "depth" --
        preserved quirk); the on-device Gauss-Newton PnP replaces the
        reference's per-item cv2.solvePnP(Ransac) host calls. The solver
        output is stop-gradiented, mirroring the reference's non-differentiable
        OpenCV prediction: gradients pull pose_net toward the PnP estimate.
        """
        match = match.astype(jnp.float32)
        depth_sampled = depth_sampled.astype(jnp.float32)
        xy = match[..., :2]
        ones = jnp.ones_like(xy[..., :1])
        pts3d = (
            jnp.einsum(
                "bij,bnj->bni",
                K_inv.astype(jnp.float32),
                jnp.concatenate([xy, ones], axis=-1),
                precision=jax.lax.Precision.HIGHEST,
            )
            * depth_sampled
        )
        corres = match[..., 2:]
        # inputs stop-gradiented like the reference's .detach() before cv2
        # (model_geometry.py:481-483); [B,6] = [tvec | rvec], same layout as
        # pose_vec
        pred = batched_pnp(
            jax.lax.stop_gradient(pts3d),
            jax.lax.stop_gradient(corres),
            K.astype(jnp.float32),
        )
        pose = pose.astype(jnp.float32)
        pos_l = jnp.abs(pred[:, :3] - pose[:, :3])
        rot_l = jnp.abs(pred[:, 3:] - pose[:, 3:])
        return jnp.mean(pos_l + self.pose_beta * rot_l, axis=1)

    def _eight_point_loss(self, key, match, pose, K_inv):
        """Fundamental-matrix consistency loss (model_geometry.py:548-566).

        F is estimated from the sampled matches by the on-device batched
        8-point RANSAC (replacing per-item cv2.findFundamentalMat) under
        stop_gradient, and compared to F(pose) = K^-T [t]x R K^-1 with a
        smooth-L1. Deliberate fixes over the reference's (shipped-disabled)
        version: both matrices are unit-Frobenius normalized and the estimate's
        sign is aligned to the prediction, so the loss is invariant to the
        projective scale/sign ambiguity of F (the reference compares a
        cv2-normalized F against an arbitrarily-scaled prediction).
        """
        # inputs stop-gradiented like the reference's .detach() before cv2
        # (model_geometry.py:537-541); also keeps the 8-point SVD out of the
        # JVP graph (full-matrices SVD has no JVP rule)
        match = jax.lax.stop_gradient(match.astype(jnp.float32))
        p1 = match[..., :2]
        p2 = match[..., 2:]
        F_hat, _ = batched_ransac_fundamental(
            key, p1, p2, iters=self.ransac_iters, thres=0.1
        )  # unit Frobenius by construction
        F_pred = fundamental_from_pose(
            pose.astype(jnp.float32), K_inv.astype(jnp.float32)
        )
        F_pred = F_pred / (
            jnp.linalg.norm(F_pred, axis=(1, 2), keepdims=True) + 1e-12
        )
        sign = jnp.sign(
            jnp.sum(F_hat * jax.lax.stop_gradient(F_pred), axis=(1, 2), keepdims=True)
        )
        sign = jnp.where(sign == 0, 1.0, sign)
        diff = F_pred - sign * F_hat
        ad = jnp.abs(diff)
        huber = jnp.where(ad < 1.0, 0.5 * diff * diff, ad - 0.5)
        return jnp.mean(huber, axis=(1, 2))

    def _triangle_loss(self, match, pose, K, K_inv, disp1, disp2):
        """Triangulated-depth registration loss (model_geometry.py:670-683)."""
        P1, P2 = projection_matrices(pose, K)
        points = midpoint_triangulate(match, K_inv, P1, P2)
        c1, d1 = reproject(P1, points)
        c2, d2 = reproject(P2, points)
        _, inter1 = register_depth(disp1, c1, d1)
        _, inter2 = register_depth(disp2, c2, d2)
        return L.triangulation_loss(d1, inter1) + L.triangulation_loss(d2, inter2)
