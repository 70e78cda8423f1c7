"""Flow-to-pose model family (legacy): pose regressed from normalized flow.

TPU-native equivalent of /root/reference/core/networks/model_flowposenet.py:
a frozen flow network produces dense flow; FlowPoseNet regresses 6-DoF pose
from the (image-size-normalized) flow; the training objective is the
SC-SfMLearner pairwise loss -- 0.15*L1 + 0.85*DSSIM photometric reconstruction
via inverse_warp2 plus a depth geometry-consistency term
(model_flowposenet.py:79-103) and edge-aware disparity smoothness (:20-66).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.geometry import inverse_warp2
from ..ops.interp import resize_area
from ..ops.ssim import ssim
from .depth_net import DepthNet
from .feature_pyramid import FeaturePyramid
from .flowpose_net import FlowPoseNet
from .pwc_decoder import PWCDecoder


def pairwise_loss(tgt_img, ref_img, tgt_depth, ref_depth, pose, K):
    """(reconstruction, geometry-consistency) means
    (model_flowposenet.py:79-103)."""
    warped, valid, projected_depth, computed_depth = inverse_warp2(
        ref_img, tgt_depth, ref_depth, pose, K
    )
    diff_img = jnp.abs(tgt_img - warped)
    diff_depth = jnp.clip(
        jnp.abs(computed_depth - projected_depth)
        / jnp.abs(computed_depth + projected_depth),
        0.0,
        1.0,
    )
    ssim_map = jnp.clip(0.5 * (1.0 - ssim(tgt_img, warped)), 0.0, 1.0)
    diff_img = 0.15 * diff_img + 0.85 * ssim_map
    return (
        jnp.mean(diff_img.astype(jnp.float32), axis=(1, 2, 3)),
        jnp.mean(diff_depth.astype(jnp.float32), axis=(1, 2, 3)),
    )


def edge_aware_smoothness(disps, img, max_scales: int = 1):
    """Quartically down-weighted multiscale edge-aware smoothness
    (model_flowposenet.py:20-59)."""
    total = 0.0
    weight = 1.0
    for s, disp in enumerate(disps):
        if s >= max_scales:
            break
        h, w = disp.shape[1], disp.shape[2]
        im = resize_area(img, (h, w))
        wx = jnp.exp(-jnp.mean(jnp.abs(im[:, :-1] - im[:, 1:]), -1, keepdims=True))
        wy = jnp.exp(-jnp.mean(jnp.abs(im[:, :, :-1] - im[:, :, 1:]), -1, keepdims=True))
        sx = jnp.abs(disp[:, :-1] - disp[:, 1:]) * wx
        sy = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:]) * wy
        total = total + (jnp.mean(sx.astype(jnp.float32)) + jnp.mean(sy.astype(jnp.float32))) * weight
        weight /= 4.0
    return total


class FlowPoseModel(nn.Module):
    """Frozen flow net + FlowPoseNet + single-scale depth net."""

    dtype: Any = jnp.float32

    def setup(self):
        self.fpyramid = FeaturePyramid(dtype=self.dtype)
        self.pwc = PWCDecoder(dtype=self.dtype)
        self.flow_pose_net = FlowPoseNet(dtype=self.dtype)
        self.depth_net = DepthNet(num_scales=1, dtype=self.dtype)

    def inference_flow(self, img1, img2):
        hw = (img1.shape[1], img1.shape[2])
        f1, f2 = self.fpyramid(img1), self.fpyramid(img2)
        return self.pwc(f1, f2, hw)[0]

    def infer_pose(self, img1, img2):
        """Pose from image-size-normalized flow (model_flowposenet.py:124-130)."""
        h, w = img1.shape[1], img1.shape[2]
        flow = self.inference_flow(img1, img2)
        flow = flow / jnp.asarray([w, h], flow.dtype)
        return self.flow_pose_net(flow)

    def infer_depth(self, img):
        return self.depth_net(img, False)[0]

    def forward_train(self, images, K_ms, K_inv_ms, train: bool = True):
        """Pairwise SC-SfMLearner objective on a 2-frame stack [B,2H,W,3]."""
        K = K_ms[:, 0]
        h = images.shape[1] // 2
        img1 = images[:, :h].astype(self.dtype)
        img2 = images[:, h:].astype(self.dtype)

        disp1 = self.depth_net(img1, train)
        disp2 = self.depth_net(img2, train)

        flow12 = self.inference_flow(img1, img2)
        wdiv = jnp.asarray([img1.shape[2], img1.shape[1]], flow12.dtype)
        pose12 = self.flow_pose_net(jax.lax.stop_gradient(flow12) / wdiv)

        rec, geo = pairwise_loss(img1, img2, disp1[0], disp2[0], pose12, K)
        smooth = edge_aware_smoothness(disp1, img1) + edge_aware_smoothness(disp2, img2)
        return {
            "loss_depth_pixel": rec,
            "loss_depth_consis": geo,
            "loss_depth_smooth": jnp.broadcast_to(smooth, rec.shape),
        }
