"""On-device PnP: 6-DoF pose from 3D-2D correspondences via Gauss-Newton.

TPU-native replacement for the reference's per-item ``cv2.solvePnP(Ransac)``
host calls (/root/reference/core/networks/model_geometry.py:473-493). The
solver is a fixed-iteration Gauss-Newton on the reprojection residual in the
axis-angle + translation parameterization, optionally wrapped in fixed-shape
RANSAC hypothesis scoring. Everything jits and vmaps; the normal equations are
6x6 solves, which XLA handles natively.

Unlike BPnP (structures/BPnP.py, implicit-function-theorem backward), the
whole solver is plain differentiable jax, so gradients flow through the
iterations if a pnp loss is enabled.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def rodrigues(rvec: jax.Array) -> jax.Array:
    """Axis-angle [3] -> rotation matrix [3,3], differentiable at 0.

    Uses the unnormalized form R = I + A[r]x + B[r]x^2 with A = sin(t)/t,
    B = (1-cos(t))/t^2 and an eps-regularized angle, so jacfwd through the
    Gauss-Newton solver stays finite at the zero-rotation initialization.
    """
    theta_sq = jnp.sum(rvec * rvec)
    small = theta_sq < 1e-8
    # double-where: the exact branch is evaluated at a safe angle so its
    # (unused) derivative stays finite in f32
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / safe_sq)
    K = jnp.array(
        [
            [0.0, -rvec[2], rvec[1]],
            [rvec[2], 0.0, -rvec[0]],
            [-rvec[1], rvec[0], 0.0],
        ]
    )
    return jnp.eye(3, dtype=rvec.dtype) + A * K + B * (K @ K)


def _residuals(params, pts3d, pts2d, K):
    """Reprojection residuals [N,2] for params = [rvec | tvec]."""
    R = rodrigues(params[:3])
    t = params[3:]
    cam = pts3d @ R.T + t  # [N,3]
    z = jnp.maximum(cam[:, 2:3], 1e-6)
    proj = (cam / z) @ K.T  # [N,3]
    return proj[:, :2] - pts2d


@partial(jax.jit, static_argnames=("num_iters",))
def pnp_gauss_newton(pts3d, pts2d, K, init_params=None, num_iters: int = 10):
    """Solve PnP for one correspondence set.

    pts3d: [N,3] (target-frame 3D points), pts2d: [N,2], K: [3,3].
    Returns params [6] = [rvec, tvec] minimizing reprojection error.
    """
    if init_params is None:
        init_params = jnp.zeros((6,), pts3d.dtype)

    def body(params, _):
        J = jax.jacfwd(lambda p: _residuals(p, pts3d, pts2d, K).reshape(-1))(params)
        r = _residuals(params, pts3d, pts2d, K).reshape(-1)
        JtJ = jnp.matmul(J.T, J, precision=_HI) + 1e-6 * jnp.eye(6)
        Jtr = jnp.matmul(J.T, r, precision=_HI)
        delta = jnp.linalg.solve(JtJ, Jtr)
        return params - delta, None

    params, _ = jax.lax.scan(body, init_params, None, length=num_iters)
    return params


@partial(jax.jit, static_argnames=("iters", "sample_size", "num_gn_iters"))
def pnp_ransac(
    key,
    pts3d,
    pts2d,
    K,
    iters: int = 100,
    sample_size: int = 6,
    thres: float = 1.0,
    num_gn_iters: int = 10,
):
    """Fixed-shape RANSAC-PnP: best hypothesis by reprojection-inlier count.

    Mirrors the role of cv2.solvePnPRansac(reprojectionError=1,
    model_geometry.py:484) with fixed iteration counts. Returns (params [6],
    inlier_mask [N]).
    """
    n = pts3d.shape[0]
    idx = jax.random.randint(key, (iters, sample_size), 0, n)

    def solve_one(sample_idx):
        return pnp_gauss_newton(
            pts3d[sample_idx], pts2d[sample_idx], K, num_iters=num_gn_iters
        )

    hyps = jax.vmap(solve_one)(idx)  # [iters, 6]
    errs = jax.vmap(lambda p: jnp.linalg.norm(_residuals(p, pts3d, pts2d, K), axis=1))(
        hyps
    )  # [iters, N]
    inliers = errs < thres
    best = jnp.argmax(jnp.sum(inliers, axis=1))
    params = pnp_gauss_newton(pts3d, pts2d, K, init_params=hyps[best], num_iters=num_gn_iters)
    return params, inliers[best]


def batched_pnp(pts3d, pts2d, K, num_iters: int = 10):
    """vmap of pnp_gauss_newton over the batch: [B,N,3],[B,N,2],[B,3,3] -> [B,6].

    Output convention matches the reference's pnp(): [tvec | rvec] columns
    ordered as (T, angle_axis) (model_geometry.py:489-491)... the reference
    returns cat(T, angle_axis); we return [rvec|tvec] internally and reorder.
    """
    params = jax.vmap(lambda a, b, k: pnp_gauss_newton(a, b, k, num_iters=num_iters))(
        pts3d, pts2d, K
    )
    return jnp.concatenate([params[:, 3:], params[:, :3]], axis=1)
