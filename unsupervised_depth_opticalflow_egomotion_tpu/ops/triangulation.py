"""Midpoint triangulation + depth registration (fully on-device).

Mirrors /root/reference/core/networks/model_geometry.py:569-683. Unlike the
reference's OpenCV-dependent PnP/fundamental paths, everything here is batched
tensor math, so it jits and runs on the TPU inside the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .warp import grid_sample

_HI = jax.lax.Precision.HIGHEST


def _bmm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def midpoint_triangulate(match, K_inv, P1, P2):
    """Midpoint triangulation of matches [B,4,N]-style ([B,N,4] here).

    Args:
      match: [B,N,4] pixel correspondences (x1,y1,x2,y2)
      K_inv: [B,3,3]
      P1, P2: [B,3,4] projection matrices
    Returns homogeneous points [B,N,4] (model_geometry.py:569-598).
    """
    b, n, _ = match.shape
    RT1 = _bmm(K_inv, P1)  # [B,3,4]
    RT2 = _bmm(K_inv, P2)
    ones = jnp.ones((b, n, 1), match.dtype)
    pts1 = jnp.concatenate([match[..., :2], ones], axis=-1)  # [B,N,3]
    pts2 = jnp.concatenate([match[..., 2:], ones], axis=-1)

    def rays(RT, pts):
        Rt = jnp.swapaxes(RT[:, :, :3], 1, 2)  # [B,3,3]
        d = jnp.einsum("bij,bjk,bnk->bni", Rt, K_inv, pts, precision=_HI)
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
        origin = -jnp.einsum("bij,bj->bi", Rt, RT[:, :, 3], precision=_HI)  # [B,3]
        return d, origin

    ray1_dir, ray1_origin = rays(RT1, pts1)
    ray2_dir, ray2_origin = rays(RT2, pts2)

    dir_cross = jnp.cross(ray1_dir, ray2_dir)  # [B,N,3]
    denom = 1.0 / (jnp.sum(dir_cross * dir_cross, axis=-1, keepdims=True) + 1e-12)
    origin_vec = (ray2_origin - ray1_origin)[:, None, :]  # [B,1,3]
    origin_vec = jnp.broadcast_to(origin_vec, ray1_dir.shape)
    a1 = jnp.sum(jnp.cross(origin_vec, ray2_dir) * dir_cross, -1, keepdims=True) * denom
    a2 = jnp.sum(jnp.cross(origin_vec, ray1_dir) * dir_cross, -1, keepdims=True) * denom
    p1 = ray1_origin[:, None, :] + a1 * ray1_dir
    p2 = ray2_origin[:, None, :] + a2 * ray2_dir
    point = 0.5 * (p1 + p2)
    return jnp.concatenate([point, jnp.ones((b, n, 1), match.dtype)], axis=-1)


def reproject(P, points_h):
    """Project homogeneous points [B,N,4] through P [B,3,4].

    Returns (pixel coords [B,N,2], depth [B,N,1]) (model_geometry.py:601-606).
    """
    p = jnp.einsum("bij,bnj->bni", P, points_h, precision=_HI)  # [B,N,3]
    coord = p[..., :2] / (p[..., 2:3] + 1e-12)
    depth = p[..., 2:3]
    return coord, depth


def scale_adapt(depth1, depth2, eps=1e-12):
    """Least-squares scale a s.t. depth1 ~ a*depth2 (model_geometry.py:608-613)."""
    A = jnp.sum((depth1**2) / (depth2**2 + eps), axis=1)
    C = jnp.sum(depth1 / (depth2 + eps), axis=1)
    return jax.lax.stop_gradient(C / (A + eps))


def affine_adapt(depth1, depth2, use_translation=True, eps=1e-12):
    """Least-squares affine (a, b) s.t. depth1 ~ a*depth2 + b
    (model_geometry.py:615-634)."""
    a_scale = scale_adapt(depth1, depth2, eps)
    if not use_translation:
        return a_scale, jnp.zeros_like(a_scale)
    A = jnp.sum((depth1**2) / (depth2**2 + eps), axis=1)
    B = jnp.sum(depth1 / (depth2**2 + eps), axis=1)
    C = jnp.sum(depth1 / (depth2 + eps), axis=1)
    D = jnp.sum(1.0 / (depth2**2 + eps), axis=1)
    E = jnp.sum(1.0 / (depth2 + eps), axis=1)
    a = (B * E - D * C) / (B * B - A * D + 1e-12)
    b = (B * C - A * E) / (B * B - A * D + 1e-12)
    cond = B * B - A * D
    valid = (jnp.abs(cond) > 1e-4).astype(a.dtype)
    a = jax.lax.stop_gradient(a * valid + a_scale * (1 - valid))
    b = jax.lax.stop_gradient(b * valid)
    return a, b


def register_depth(depth_pred, coord_tri, depth_tri):
    """Median + affine-register a dense depth map against triangulated points.

    depth_pred: [B,H,W,1], coord_tri: [B,N,2] (pixels), depth_tri: [B,N,1].
    Returns (registered dense depth, registered sampled depth)
    (model_geometry.py:636-653). Sampling uses reflection padding like the
    reference's grid_sample(padding_mode='reflection'); since sample coords
    come from in-frame reprojections, border handling is negligible and we
    clamp instead (clip to edge).
    """
    b, h, w, _ = depth_pred.shape
    n = depth_tri.shape[1]
    gx = 2.0 * coord_tri[..., 0] / (w - 1.0) - 1.0
    gy = 2.0 * coord_tri[..., 1] / (h - 1.0) - 1.0
    coords = jnp.stack([jnp.clip(gx, -1, 1), jnp.clip(gy, -1, 1)], axis=-1)
    depth_inter = grid_sample(depth_pred, coords.reshape(b, n, 1, 2)).reshape(b, n, 1)

    scale = jnp.median(depth_inter, axis=1) / (jnp.median(depth_tri, axis=1) + 1e-12)
    scale = jax.lax.stop_gradient(scale)  # [B,1]
    sd_inter = depth_inter / (scale[:, None] + 1e-12)
    sd_pred = depth_pred / (scale[:, None, None] + 1e-12)

    a, b_ = affine_adapt(sd_inter, depth_tri, use_translation=False)
    aff_inter = a[:, None] * sd_inter + b_[:, None]
    aff_pred = a[:, None, None] * sd_pred + b_[:, None, None]
    return aff_pred, aff_inter
