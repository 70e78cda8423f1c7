"""Pure projective-geometry ops (NHWC, fully jittable).

Semantics mirror /root/reference/core/networks/structures/inverse_warp.py:
- Euler rotation composition R = Rx @ Ry @ Rz (inverse_warp.py:110-145)
- pose vec = [tx, ty, tz, rx, ry, rz] -> [B,3,4] (inverse_warp.py:172-187)
- projection clamps Z at 1e-3 and pushes out-of-frame coords to 2 so that the
  zero-padded sampler returns 0 and the valid mask is false
  (inverse_warp.py:227-260)
- ``inverse_warp2`` returns (projected_img, valid_mask, projected_depth,
  computed_depth) (inverse_warp.py:263-303)
- rigid flow = projected pixel coords - identity grid (inverse_warp.py:311-342)
- essential matrix E = [t]x R (inverse_warp.py:344-364)

All matrix work is batched [B,3,3]/[B,3,4] einsums so XLA maps it onto the MXU;
per-pixel transforms are one [B,3,3] x [B,3,HW] contraction, not a Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .warp import grid_sample, pixel_grid

# All the matrices here are 3x3/3x4 -- force full f32 so pose/projection math
# is not quantized to the default (bf16-ish) matmul precision.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def euler2mat(angle: jax.Array) -> jax.Array:
    """Euler angles [B,3] (x, y, z, radians) -> rotation matrices [B,3,3]."""
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)

    cosz, sinz = jnp.cos(z), jnp.sin(z)
    zmat = jnp.stack(
        [cosz, -sinz, zeros, sinz, cosz, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)

    cosy, siny = jnp.cos(y), jnp.sin(y)
    ymat = jnp.stack(
        [cosy, zeros, siny, zeros, ones, zeros, -siny, zeros, cosy], axis=1
    ).reshape(-1, 3, 3)

    cosx, sinx = jnp.cos(x), jnp.sin(x)
    xmat = jnp.stack(
        [ones, zeros, zeros, zeros, cosx, -sinx, zeros, sinx, cosx], axis=1
    ).reshape(-1, 3, 3)

    return _mm(_mm(xmat, ymat), zmat)


def quat2mat(quat: jax.Array) -> jax.Array:
    """Quaternion tail [B,3] (w fixed to 1 pre-normalization) -> [B,3,3]."""
    norm_quat = jnp.concatenate([jnp.ones_like(quat[:, :1]), quat], axis=1)
    norm_quat = norm_quat / jnp.linalg.norm(norm_quat, axis=1, keepdims=True)
    w, x, y, z = (norm_quat[:, i] for i in range(4))
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=1,
    ).reshape(-1, 3, 3)


def pose_vec2mat(vec: jax.Array, rotation_mode: str = "euler") -> jax.Array:
    """6-DoF pose [B,6] ([t | r]) -> transform [B,3,4]."""
    translation = vec[:, :3, None]
    rot = vec[:, 3:]
    rot_mat = euler2mat(rot) if rotation_mode == "euler" else quat2mat(rot)
    return jnp.concatenate([rot_mat, translation], axis=2)


def pixel2cam(depth: jax.Array, intrinsics_inv: jax.Array) -> jax.Array:
    """Backproject: depth [B,H,W] + K_inv [B,3,3] -> cam points [B,H,W,3].

    Runs in f32 even under a bf16 compute dtype -- projective coordinates
    need the mantissa.
    """
    b, h, w = depth.shape
    depth = depth.astype(jnp.float32)
    grid = pixel_grid(h, w, jnp.float32)
    homo = jnp.concatenate([grid, jnp.ones((h, w, 1), jnp.float32)], axis=-1)  # [H,W,3]
    cam = jnp.einsum(
        "bij,hwj->bhwi", intrinsics_inv.astype(jnp.float32), homo, precision=_HI
    )
    return cam * depth[..., None]


def _project(cam_coords: jax.Array, proj: jax.Array):
    """cam points [B,H,W,3] through [B,3,4] -> (x/z, y/z pixel coords, clamped z)."""
    pts = (
        jnp.einsum("bij,bhwj->bhwi", proj[:, :, :3], cam_coords, precision=_HI)
        + proj[:, None, None, :, 3]
    )
    X, Y, Z = pts[..., 0], pts[..., 1], pts[..., 2]
    Z = jnp.maximum(Z, 1e-3)
    return X / Z, Y / Z, Z


def cam2pixel_norm(cam_coords: jax.Array, proj: jax.Array, padding_mode: str = "zeros"):
    """Project to normalized [-1,1] pixel coords.

    Returns (coords [B,H,W,2], computed_depth [B,H,W,1]). With zeros padding,
    coords that fall outside [-1,1] are pushed to 2 (inverse_warp.py:252-257).
    """
    b, h, w, _ = cam_coords.shape
    Xp, Yp, Z = _project(cam_coords, proj)
    x_norm = 2.0 * Xp / (w - 1) - 1.0
    y_norm = 2.0 * Yp / (h - 1) - 1.0
    if padding_mode == "zeros":
        x_norm = jnp.where(jnp.abs(x_norm) > 1.0, 2.0, x_norm)
        y_norm = jnp.where(jnp.abs(y_norm) > 1.0, 2.0, y_norm)
    coords = jnp.stack([x_norm, y_norm], axis=-1)
    return coords, Z[..., None]


def cam2pixel_px(cam_coords: jax.Array, proj: jax.Array) -> jax.Array:
    """Project to raw pixel coords [B,H,W,2] (no normalization, Z clamp 1e-3)."""
    Xp, Yp, _ = _project(cam_coords, proj)
    return jnp.stack([Xp, Yp], axis=-1)


def rigid_projection(
    depth: jax.Array,
    pose: jax.Array,
    intrinsics: jax.Array,
    padding_mode: str = "zeros",
):
    """One depth+pose projection pass, all consumers served.

    Returns (coords [B,H,W,2] normalized with the oob->2 trick, valid
    [B,H,W,1] f32, computed_depth [B,H,W,1], rigid_flow [B,H,W,2] f32).
    The geom objective needs both the warp coords (inverse_warp2,
    inverse_warp.py:263-303) and the rigid flow (dynamic-region masks,
    model_geometry.py:685-713) of the SAME (depth, pose, K) every scale;
    computing them from one pixel2cam+project pipeline halves that work.
    """
    b, h, w, _ = depth.shape
    K_inv = jnp.linalg.inv(intrinsics)
    cam_coords = pixel2cam(depth[..., 0], K_inv)
    proj = _mm(intrinsics, pose_vec2mat(pose.astype(jnp.float32)))
    Xp, Yp, Z = _project(cam_coords, proj)
    x_norm = 2.0 * Xp / (w - 1) - 1.0
    y_norm = 2.0 * Yp / (h - 1) - 1.0
    if padding_mode == "zeros":
        x_norm = jnp.where(jnp.abs(x_norm) > 1.0, 2.0, x_norm)
        y_norm = jnp.where(jnp.abs(y_norm) > 1.0, 2.0, y_norm)
    coords = jnp.stack([x_norm, y_norm], axis=-1)
    valid = (jnp.max(jnp.abs(coords), axis=-1) <= 1.0).astype(jnp.float32)[..., None]
    rigid = jnp.stack([Xp, Yp], axis=-1) - pixel_grid(h, w, jnp.float32)[None]
    return coords, valid, Z[..., None], rigid


def rigid_sample_coords(
    depth: jax.Array,
    pose: jax.Array,
    intrinsics: jax.Array,
    padding_mode: str = "zeros",
):
    """Normalized sampling coords of the depth+pose inverse warp.

    Returns (coords [B,H,W,2], valid [B,H,W,1] f32, computed_depth [B,H,W,1]):
    the projection half of inverse_warp2, exposed so callers can batch the
    actual image gather with other sampling work (ops/warp.py
    grid_sample_with_weight_multi).
    """
    coords, valid, computed_depth, _ = rigid_projection(
        depth, pose, intrinsics, padding_mode
    )
    return coords, valid, computed_depth


def inverse_warp2(
    img: jax.Array,
    depth: jax.Array,
    ref_depth: jax.Array,
    pose: jax.Array,
    intrinsics: jax.Array,
    padding_mode: str = "zeros",
    sample_ref_depth: bool = True,
):
    """Depth+pose inverse warp of a source image onto the target plane.

    Args:
      img: source image [B,H,W,3] (sampled)
      depth: target depth [B,H,W,1]
      ref_depth: source depth [B,H,W,1] (sampled)
      pose: [B,6] target->source
      intrinsics: [B,3,3]

    Returns (projected_img, valid_mask [B,H,W,1], projected_depth (>=1e-3),
    computed_depth), mirroring inverse_warp.py:263-303.
    """
    coords, valid, computed_depth = rigid_sample_coords(
        depth, pose, intrinsics, padding_mode
    )
    valid = valid.astype(img.dtype)
    if not sample_ref_depth:
        # projected_depth feeds only the depth-consis loss (disabled in the
        # reference's live config, model_geometry.py:897-899); skipping the
        # sample avoids a gather whose backward is a scatter-add (ref_depth
        # is network output). img is a camera frame by contract, so the
        # data-source kernel path applies (no source gradient needed).
        projected_img = grid_sample(img, coords, src_is_data=True)
        return projected_img, valid, None, computed_depth
    # img and ref_depth are sampled at identical coords: one fused gather
    # (4-channel slices) instead of two.
    sampled = grid_sample(
        jnp.concatenate([img, ref_depth.astype(img.dtype)], axis=-1), coords
    )
    projected_img = sampled[..., :3]
    projected_depth = jnp.maximum(sampled[..., 3:], 1e-3)
    return projected_img, valid, projected_depth, computed_depth


def calculate_rigid_flow(depth: jax.Array, pose: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Rigid flow [B,H,W,2] induced by depth [B,H,W,1] and pose [B,6]."""
    b, h, w, _ = depth.shape
    K_inv = jnp.linalg.inv(intrinsics)
    cam_coords = pixel2cam(depth[..., 0], K_inv)
    proj = _mm(intrinsics, pose_vec2mat(pose.astype(jnp.float32)))
    coords_px = cam2pixel_px(cam_coords, proj)
    return coords_px - pixel_grid(h, w, jnp.float32)[None]


def skew_symmetric(t: jax.Array) -> jax.Array:
    """Translation [B,3] -> skew-symmetric cross-product matrices [B,3,3]."""
    x, y, z = t[:, 0], t[:, 1], t[:, 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack([zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=1).reshape(-1, 3, 3)


def essential_matrix(pose_vec: jax.Array, rotation_mode: str = "euler") -> jax.Array:
    """E = [t]x R from a 6-DoF pose vector [B,6]."""
    t = pose_vec[:, :3]
    rot = pose_vec[:, 3:]
    R = euler2mat(rot) if rotation_mode == "euler" else quat2mat(rot)
    return _mm(skew_symmetric(t), R)


def fundamental_from_pose(pose_vec: jax.Array, intrinsics_inv: jax.Array) -> jax.Array:
    """F = K^-T [t]x R K^-1 (model_geometry.py:374-378)."""
    E = essential_matrix(pose_vec)
    return _mm(_mm(jnp.swapaxes(intrinsics_inv, 1, 2), E), intrinsics_inv)


def projection_matrices(pose_vec: jax.Array, intrinsics: jax.Array):
    """P1 = K [I|0], P2 = K [R|t] (inverse_warp.py:366-374)."""
    b = intrinsics.shape[0]
    iden = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=-1)[None].repeat(b, 0)
    P1 = _mm(intrinsics, iden.astype(intrinsics.dtype))
    P2 = _mm(intrinsics, pose_vec2mat(pose_vec))
    return P1, P2


def disp2depth(disp: jax.Array, min_depth: float = 0.1, max_depth: float = 100.0) -> jax.Array:
    """Sigmoid disparity -> bounded depth (model_geometry.py:282-287)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled = min_disp + (max_disp - min_disp) * disp
    return 1.0 / scaled
