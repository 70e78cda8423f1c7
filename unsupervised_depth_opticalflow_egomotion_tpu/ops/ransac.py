"""On-device batched RANSAC fundamental-matrix estimation.

TPU-native replacement for the reference's per-batch-item
``cv2.findFundamentalMat`` host calls (/root/reference/core/networks/
structures/ransac.py:44-66, model_geometry.py:532-546) -- the main
host<->device sync points in the reference's geometry path. Here everything is
fixed-shape and jittable:

- hypotheses: ``iters`` 8-point minimal samples drawn in one batched gather
- solver: normalized 8-point via SVD (smallest right singular vector),
  rank-2 projection
- scoring: Sampson epipolar distance, inlier counting at a threshold
- output: the hypothesis with the max inlier count per batch item

vmapped over both the batch and the hypothesis dimensions, so the TPU sees a
single [B*iters] batch of 9x9 SVDs instead of a python loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _normalize_points(pts):
    """Hartley normalization: zero mean, mean distance sqrt(2). pts [N,2]."""
    mean = jnp.mean(pts, axis=0)
    centered = pts - mean
    scale = jnp.sqrt(2.0) / (jnp.mean(jnp.linalg.norm(centered, axis=1)) + 1e-12)
    T = jnp.array(
        [[scale, 0.0, -scale * mean[0]], [0.0, scale, -scale * mean[1]], [0.0, 0.0, 1.0]]
    )
    return centered * scale, T


def eight_point(p1, p2):
    """Normalized 8-point fundamental matrix from >=8 correspondences.

    p1, p2: [N,2] pixel coords. Returns F [3,3] (rank-2, unit Frobenius norm).
    """
    p1n, T1 = _normalize_points(p1)
    p2n, T2 = _normalize_points(p2)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    ones = jnp.ones_like(x1)
    # constraint rows: p2^T F p1 = 0
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[-1].reshape(3, 3)
    # rank-2 projection
    u, s, vt2 = jnp.linalg.svd(F)
    F = (u * s.at[2].set(0.0)[None, :]) @ vt2
    F = jnp.matmul(jnp.matmul(T2.T, F, precision=_HI), T1, precision=_HI)
    return F / (jnp.linalg.norm(F) + 1e-12)


def sampson_distance(F, p1, p2):
    """Sampson epipolar distance of correspondences under F. p1,p2 [N,2]."""
    ones = jnp.ones((p1.shape[0], 1), p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=1)  # [N,3]
    x2 = jnp.concatenate([p2, ones], axis=1)
    Fx1 = x1 @ F.T  # [N,3] = (F @ x1^T)^T
    Ftx2 = x2 @ F  # [N,3]
    num = jnp.sum(x2 * Fx1, axis=1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2 + 1e-12
    return num / den


@partial(jax.jit, static_argnames=("iters",))
def ransac_fundamental(key, p1, p2, iters: int = 100, thres: float = 0.1):
    """RANSAC-F for one correspondence set. p1,p2 [N,2].

    Returns (F [3,3], inlier_mask [N]). ``thres`` is on the Sampson distance
    (matching the reference's FM_RANSAC threshold 0.1, ransac.py:59).
    """
    n = p1.shape[0]
    idx = jax.random.randint(key, (iters, 8), 0, n)
    p1s = p1[idx]  # [iters, 8, 2]
    p2s = p2[idx]
    Fs = jax.vmap(eight_point)(p1s, p2s)  # [iters,3,3]
    dists = jax.vmap(lambda F: sampson_distance(F, p1, p2))(Fs)  # [iters,N]
    inliers = dists < thres**2
    counts = jnp.sum(inliers, axis=1)
    best = jnp.argmax(counts)
    return Fs[best], inliers[best]


def batched_ransac_fundamental(key, p1, p2, iters: int = 100, thres: float = 0.1):
    """RANSAC-F over a batch: p1,p2 [B,N,2] -> (F [B,3,3], inliers [B,N])."""
    keys = jax.random.split(key, p1.shape[0])
    return jax.vmap(lambda k, a, b: ransac_fundamental(k, a, b, iters, thres))(
        keys, p1, p2
    )
