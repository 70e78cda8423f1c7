"""Occlusion / texture / dynamic / rigid mask computation (NHWC pyramids).

Pure functions over per-scale lists; every op is elementwise or a tiny
reduction, so XLA fuses each mask into the loss consumers. Semantics follow
/root/reference/core/networks/model_geometry.py (line refs below) with
``stop_gradient`` standing in for torch's ``no_grad``/detached weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import calculate_rigid_flow
from .warp import pixel_grid


def flow_norm(flow: jax.Array, p: int = 2) -> jax.Array:
    """L_p norm over the flow channel + 1e-12 -> [B,H,W,1] (model_geometry.py:48-54)."""
    if p == 2:
        n = jnp.sqrt(jnp.sum(flow * flow, axis=-1, keepdims=True))
    else:
        n = jnp.sum(jnp.abs(flow) ** p, axis=-1, keepdims=True) ** (1.0 / p)
    return n + 1e-12


def flow_normalization(flow: jax.Array, p: int = 2) -> jax.Array:
    """Unit-norm flow (model_geometry.py:56-63).

    Computed in f32 with the epsilon INSIDE the radical: with the reference's
    sqrt(s) + 1e-12 form, d sqrt/ds = 1/(2 sqrt(s)) is inf at an exactly-zero
    flow pixel and the chain emits 0*inf = NaN -- one such pixel killed a
    12k-step flow run at step 5800. sqrt(s + 1e-12) has a finite gradient
    everywhere and differs by <= 5e-13 px in the norm -- far inside the
    parity-test tolerance.
    """
    f32 = flow.astype(jnp.float32)
    if p == 2:
        n = jnp.sqrt(jnp.sum(f32 * f32, axis=-1, keepdims=True) + 1e-12)
    else:
        n = (jnp.sum(jnp.abs(f32) ** p, axis=-1, keepdims=True) + 1e-12) ** (1.0 / p)
    return (f32 / (n + 1e-12)).astype(flow.dtype)


def occlusion_weights(warped_from_l, imgs, warped_from_r):
    """Hard occlusion weights + validity masks from photometric diffs.

    Per scale: softmax over the (left-diff, right-diff) pair, weight = 1 -
    softmax, thresholded > 0.48 under stop_gradient; validity = any channel of
    the flow-warped image non-zero (model_geometry.py:105-132).

    Returns (weight_bwd, weight_fwd, valid_bwd, valid_fwd) pyramids of
    [B,H,W,1].
    """
    weight_bwd, weight_fwd, valid_bwd, valid_fwd = [], [], [], []
    for img_from_l, img, img_from_r in zip(warped_from_l, imgs, warped_from_r):
        valid_fwd.append(
            1.0 - jnp.all(img_from_r == 0, axis=-1, keepdims=True).astype(img.dtype)
        )
        valid_bwd.append(
            1.0 - jnp.all(img_from_l == 0, axis=-1, keepdims=True).astype(img.dtype)
        )
        diff_l = jnp.mean(jnp.abs(img - img_from_l), axis=-1, keepdims=True)
        diff_r = jnp.mean(jnp.abs(img - img_from_r), axis=-1, keepdims=True)
        diff_cat = jnp.concatenate([diff_l, diff_r], axis=-1)
        weight = 1.0 - jax.nn.softmax(diff_cat, axis=-1)
        weight = jax.lax.stop_gradient((weight > 0.48).astype(img.dtype))
        weight_bwd.append(weight[..., 0:1])
        weight_fwd.append(weight[..., 1:2])
    return weight_bwd, weight_fwd, valid_bwd, valid_fwd


def diff_weights(warped_from_l, imgs, warped_from_r):
    """Soft occlusion weights of the reference's (unrunnable) flow-only mode.

    weight = 2*exp(-(w-0.5)^2/0.03) * valid, where w = 1 - softmax(diffs)
    (model_flow.py:105-138). Returns (diff_bwd, diff_fwd, weight_bwd,
    weight_fwd) pyramids; diffs are channel-mean photometric residuals.

    NOT used by the live flow objective: the weights reach 2.0, which makes
    the consistency loss's (1 - occ) mask negative and lets the pixel term
    be silenced by divergent diffs; model_flow.py also never ran as
    published (survey defects 1-2). Kept as the faithful record of that
    scheme; JointModel.forward_flow uses the geom-mode hard occlusion masks
    instead (see the deviation note there).
    """
    diff_bwd, diff_fwd, weight_bwd, weight_fwd = [], [], [], []
    for img_from_l, img, img_from_r in zip(warped_from_l, imgs, warped_from_r):
        valid_fwd = 1.0 - jnp.all(img_from_r == 0, axis=-1, keepdims=True).astype(img.dtype)
        valid_bwd = 1.0 - jnp.all(img_from_l == 0, axis=-1, keepdims=True).astype(img.dtype)
        diff_l = jnp.mean(jnp.abs(img - img_from_l), axis=-1, keepdims=True)
        diff_r = jnp.mean(jnp.abs(img - img_from_r), axis=-1, keepdims=True)
        diff_cat = jnp.concatenate([diff_l, diff_r], axis=-1)
        weight = 1.0 - jax.nn.softmax(diff_cat, axis=-1)
        weight = jax.lax.stop_gradient(weight)
        weight = 2.0 * jnp.exp(-((weight - 0.5) ** 2) / 0.03)
        weight_bwd.append(weight[..., 0:1] * valid_bwd)
        weight_fwd.append(weight[..., 1:2] * valid_fwd)
        diff_bwd.append(diff_l)
        diff_fwd.append(diff_r)
    return diff_bwd, diff_fwd, weight_bwd, weight_fwd


def texture_masks(imgs, warped, sources):
    """1 where the warped image beats the unwarped source photometrically
    (model_geometry.py:134-140)."""
    out = []
    for img, img_w, img_s in zip(imgs, warped, sources):
        m = jnp.mean(jnp.abs(img - img_w), axis=-1, keepdims=True) < jnp.mean(
            jnp.abs(img - img_s), axis=-1, keepdims=True
        )
        out.append(m.astype(img.dtype))
    return out


def dynamic_masks(intrinsics, depths, pose, flows, alpha: float, beta: float):
    """Rigid-vs-predicted-flow agreement masks (model_geometry.py:685-713).

    Per scale: rigid flow from (depth, pose, K/2^s); bound = alpha*(|f|^2 +
    |r|^2) + beta; mask = |f - r|^2 < bound (stop-grad); score =
    1/(1e-4 + |f - r|).

    Returns (flow_diffs, masks, scores) pyramids.
    """
    h0 = depths[0].shape[1]
    flow_diffs, masks, scores = [], [], []
    for depth, flow in zip(depths, flows):
        h = depth.shape[1]
        downscale = h0 / h
        K_scaled = jnp.concatenate(
            [intrinsics[:, 0:2] / downscale, intrinsics[:, 2:]], axis=1
        )
        rigid = calculate_rigid_flow(depth, pose, K_scaled)
        bound = (
            alpha * (flow_norm(flow) ** 2 + flow_norm(rigid) ** 2) + beta
        )
        diff = jnp.abs(rigid - flow)
        flow_diffs.append(diff)
        dn = flow_norm(diff)
        masks.append(jax.lax.stop_gradient((dn**2 < bound).astype(flow.dtype)))
        scores.append(jax.lax.stop_gradient(1.0 / (1e-4 + dn)))
    return flow_diffs, masks, scores


def epipolar_map(pose_vec, flow, intrinsics, intrinsics_inv):
    """Per-pixel point-to-epipolar-line distance [B,H,W,1]
    (model_geometry.py:355-403)."""
    from .geometry import fundamental_from_pose

    b, h, w, _ = flow.shape
    flow = flow.astype(jnp.float32)  # pixel coords need the f32 mantissa
    grid = pixel_grid(h, w, jnp.float32)[None]
    p1 = grid  # [B,H,W,2] (broadcast over batch)
    p2 = grid + flow
    F = fundamental_from_pose(
        pose_vec.astype(jnp.float32), intrinsics_inv.astype(jnp.float32)
    )  # [B,3,3]

    ones = jnp.ones((b, h, w, 1), jnp.float32)
    p1h = jnp.concatenate([jnp.broadcast_to(p1, (b, h, w, 2)), ones], axis=-1)
    p2h = jnp.concatenate([p2, ones], axis=-1)
    epi_line = jnp.einsum("bij,bhwj->bhwi", F, p1h, precision=jax.lax.Precision.HIGHEST)
    a = epi_line[..., 0]
    bb = epi_line[..., 1]
    dist_div = jnp.sqrt(a * a + bb * bb) + 1e-6
    geom_dist = jnp.abs(jnp.sum(p2h * epi_line, axis=-1))
    return (geom_dist / dist_div)[..., None]


def rigid_masks(dist_map, rigid_thres: float = 0.5, inlier_thres: float = 0.1):
    """(rigid, inlier, score) masks from an epipolar distance map
    (model_geometry.py:420-425)."""
    rigid = jax.lax.stop_gradient((dist_map < rigid_thres).astype(dist_map.dtype))
    inlier = jax.lax.stop_gradient((dist_map < inlier_thres).astype(dist_map.dtype))
    score = jax.lax.stop_gradient(rigid / (1.0 + dist_map))
    return rigid, inlier, score


def fuse_masks(*mask_pyramids):
    """Elementwise product of any number of mask pyramids
    (model_geometry.py:735-765)."""
    out = []
    for masks in zip(*mask_pyramids):
        m = masks[0]
        for other in masks[1:]:
            m = m * other
        out.append(m)
    return out
