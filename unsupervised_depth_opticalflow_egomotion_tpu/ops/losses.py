"""Self-supervision losses over NHWC pyramids.

Every function returns a per-batch-item vector [B] (sum over scales), matching
the reference's loss packing (each loss is later weighted and ``.mean()``-ed in
the train step, /root/reference/train.py:211-214). Line references point into
/root/reference/core/networks/model_geometry.py unless noted.

All reductions happen in f32 regardless of the compute dtype upstream; masks
and images are multiplied before reduction so the whole loss graph fuses into
a few VPU passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .interp import resize_bilinear
from .masks import flow_normalization
from .ssim import ssim


def _bmean(x: jax.Array) -> jax.Array:
    """Mean over all but the batch dim, in f32."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))


def photometric_loss(imgs, warped, masks) -> jax.Array:
    """Masked L1 photometric loss (:143-153)."""
    per_scale = []
    for img, img_w, mask in zip(imgs, warped, masks):
        divider = _bmean(mask)
        diff = jnp.abs(img - img_w) * mask
        per_scale.append(_bmean(diff) / (divider + 1e-12))
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def masked_diff_loss(diffs, masks) -> jax.Array:
    """Precomputed-residual variant used by the flow-only objective
    (model_flow.py:94-103)."""
    per_scale = []
    for diff, mask in zip(diffs, masks):
        divider = _bmean(mask)
        per_scale.append(_bmean(diff * mask) / (divider + 1e-12))
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def ssim_loss(imgs, warped, masks) -> jax.Array:
    """Masked DSSIM (:212-223): SSIM computed on mask-multiplied images."""
    per_scale = []
    for img, img_w, mask in zip(imgs, warped, masks):
        divider = _bmean(mask)
        s = ssim(img * mask, img_w * mask)
        l = jnp.clip((1.0 - s) / 2.0, 0.0, 1.0)
        per_scale.append(_bmean(l) / (divider + 1e-12))
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def disp_smooth_loss(img, disps) -> jax.Array:
    """Edge-aware first-order disparity smoothness (:225-252).

    Each scale's disp is bilinearly upsampled to the full image resolution
    before differencing, as the reference does.
    """
    h, w = img.shape[1], img.shape[2]
    gx = jnp.mean(jnp.abs(img[:, :, :-1] - img[:, :, 1:]), axis=-1, keepdims=True)
    gy = jnp.mean(jnp.abs(img[:, :-1] - img[:, 1:]), axis=-1, keepdims=True)
    wx = jnp.exp(-gx)
    wy = jnp.exp(-gy)
    per_scale = []
    for disp in disps:
        d = resize_bilinear(disp, (h, w))
        dgx = jnp.abs(d[:, :, :-1] - d[:, :, 1:]) * wx
        dgy = jnp.abs(d[:, :-1] - d[:, 1:]) * wy
        per_scale.append(_bmean(dgx) + _bmean(dgy))
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def _grads(x):
    dy = x[:, 1:] - x[:, :-1]
    dx = x[:, :, 1:] - x[:, :, :-1]
    return dx, dy


def flow_smooth_loss(flows, imgs) -> jax.Array:
    """Second-order edge-aware flow smoothness on flow/20 (:259-279)."""
    per_scale = []
    for flow, img in zip(flows, imgs):
        f = flow / 20.0
        igx, igy = _grads(img)
        wx = jnp.exp(-10.0 * jnp.mean(jnp.abs(igx), axis=-1, keepdims=True))
        wy = jnp.exp(-10.0 * jnp.mean(jnp.abs(igy), axis=-1, keepdims=True))
        dx, dy = _grads(f)
        dx2, _ = _grads(dx)
        _, dy2 = _grads(dy)
        err = _bmean(wx[:, :, 1:] * jnp.abs(dx2)) + _bmean(wy[:, 1:] * jnp.abs(dy2))
        per_scale.append(err / 2.0)
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def flow_consis_loss(fwd_flows, bwd_flows, occ_masks) -> jax.Array:
    """Forward/backward direction consistency on normalized flows (:195-210).

    The backward term is stop-gradiented; the mask is inverted (occluded
    regions drive the consistency).
    """
    per_scale = []
    for fwd, bwd, occ in zip(fwd_flows, bwd_flows, occ_masks):
        fwd_n = flow_normalization(fwd)
        bwd_n = jax.lax.stop_gradient(flow_normalization(bwd))
        mask = 1.0 - occ
        divider = _bmean(mask)
        l = _bmean(jnp.abs(fwd_n + bwd_n) * mask) / (divider + 1e-12)
        per_scale.append(l)
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def depth_consis_loss(predicted_depths, computed_depths, masks) -> jax.Array:
    """Scale-consistent depth loss |c-p|/(c+p), clamped to [0,1] (:182-193)."""
    per_scale = []
    for pred, comp, mask in zip(predicted_depths, computed_depths, masks):
        divider = _bmean(mask)
        diff = jnp.clip(jnp.abs(comp - pred) / jnp.abs(comp + pred), 0.0, 1.0)
        per_scale.append(_bmean(diff * mask) / (divider + 1e-12))
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def depth_flow_consis_loss(flow_diffs, masks=None, scales: int = 1) -> jax.Array:
    """|rigid_flow - flow| under a mask, usually top scale only (:716-732)."""
    per_scale = []
    for s in range(scales):
        diff = flow_diffs[s]
        if masks is None:
            mask = jnp.ones(diff.shape[:3] + (1,), diff.dtype)
        else:
            mask = masks[s]
        divider = _bmean(mask)
        per_scale.append(_bmean(diff * mask) / (divider + 1e-12))
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def epipolar_loss(dist_map, rigid_mask) -> jax.Array:
    """Epipolar distance loss.

    The reference computes the masked mean then overwrites it with the
    unmasked mean (model_geometry.py:413-418, survey defect #8); the effective
    behaviour -- unmasked mean -- is reproduced deliberately.
    """
    del rigid_mask
    return _bmean(dist_map)


def triangulation_loss(tri_depth, pred_tri_depth) -> jax.Array:
    """(1 - pred/tri)^2 over sampled points [B,N,1] (:655-659)."""
    l = (1.0 - pred_tri_depth / (tri_depth + 1e-12)) ** 2
    return jnp.mean(l.astype(jnp.float32), axis=(1, 2))
