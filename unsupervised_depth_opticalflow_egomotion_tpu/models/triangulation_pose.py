"""Legacy TrianFlow two-view pipeline: flow -> F-matrix -> pose -> triangulated depth.

TPU-native re-design of the reference's legacy model family
(/root/reference/core/networks/model_triangulate_pose.py and
model_depth_pose.py) whose published form is broken (it calls Model_flow APIs
that no longer exist -- survey defect #4) and host-bound (per-item cv2
RANSAC/recoverPose). Everything here is fixed-shape and jittable:

- correspondences: uniform grid samples of the dense flow + forward/backward
  consistency scores
- fundamental matrix: on-device RANSAC 8-point (ops/ransac.py), replacing
  ``reduced_ransac``'s cv2.findFundamentalMat (structures/ransac.py:44-66)
- pose: E = K^T F K, SVD -> 4 candidate (R, t), chirality vote by triangulated
  depth positivity (model_depth_pose.py:239-275), all vmapped
- structure: midpoint triangulation + ray-angle *weights* (the reference
  filters to a data-dependent count, model_depth_pose.py:123-166; we keep the
  fixed shape and weight instead)
- depth alignment: median + affine registration of the network depth to the
  triangulated depth (ops/triangulation.py)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.geometry import disp2depth
from ..ops.ransac import batched_ransac_fundamental
from ..ops.sampling import build_matches, random_sample
from ..ops.triangulation import midpoint_triangulate, register_depth, reproject
from ..ops import losses as L
from .depth_net import DepthNet
from .feature_pyramid import FeaturePyramid
from .pwc_decoder import PWCDecoder

_HI = jax.lax.Precision.HIGHEST


def _bmm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def essential_from_fundamental(F, K):
    """E = K^T F K (model_depth_pose.py:245-246)."""
    return _bmm(_bmm(jnp.swapaxes(K, 1, 2), F), K)


def _verify_rt(match, K_inv, P1, P2):
    """Chirality score: count of triangulated points with positive depth in
    both views (model_depth_pose.py:227-237). match [B,N,4]."""
    points = midpoint_triangulate(match, K_inv, P1, P2)  # [B,N,4]
    d1 = jnp.einsum("bij,bnj->bni", P1, points, precision=_HI)[..., 2]
    d2 = jnp.einsum("bij,bnj->bni", P2, points, precision=_HI)[..., 2]
    return jnp.sum(((d1 > 0) & (d2 > 0)).astype(jnp.float32), axis=1)


def pose_from_fundamental(F, K, verify_match):
    """Recover (P1, P2) from F via essential-matrix SVD + 4-way chirality vote.

    F: [B,3,3], K: [B,3,3], verify_match: [B,M,4] correspondences used for
    the chirality check (model_depth_pose.py:239-275).
    Returns (P1 [B,3,4], P2 [B,3,4], Rt [B,3,4]).
    """
    b = F.shape[0]
    E = essential_from_fundamental(F, K)
    U, S, Vt = jnp.linalg.svd(E)
    W = jnp.broadcast_to(
        jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]), (b, 3, 3)
    )
    R1 = _bmm(_bmm(U, W), Vt)
    R1 = jnp.sign(jnp.linalg.det(R1))[:, None, None] * R1
    R2 = _bmm(_bmm(U, jnp.swapaxes(W, 1, 2)), Vt)
    R2 = jnp.sign(jnp.linalg.det(R2))[:, None, None] * R2
    t1 = U[:, :, 2:3]
    t2 = -t1

    iden = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=-1), (b, 3, 4)
    )
    P1 = _bmm(K, iden)
    K_inv = jnp.linalg.inv(K)

    Rts = [
        jnp.concatenate([R1, t1], -1),
        jnp.concatenate([R2, t1], -1),
        jnp.concatenate([R1, t2], -1),
        jnp.concatenate([R2, t2], -1),
    ]
    P2s = [_bmm(K, rt) for rt in Rts]
    votes = jnp.stack(
        [jax.lax.stop_gradient(_verify_rt(verify_match, K_inv, P1, p2)) for p2 in P2s],
        axis=1,
    )  # [B,4]
    best = jnp.argmax(votes, axis=1)  # [B]
    Rt = jnp.stack(Rts, axis=1)[jnp.arange(b), best]
    P2 = jnp.stack(P2s, axis=1)[jnp.arange(b), best]
    return P1, P2, Rt


def ray_angle_weights(match, K, P1, P2, thres: float = 0.001):
    """Soft validity of triangulation rays: cos of the ray/baseline-normal
    angle must exceed ``thres`` (model_depth_pose.py:123-150).

    Returns [B,N,1] weights (1 = well-conditioned ray pair).
    """
    b, n, _ = match.shape
    K_inv = jnp.linalg.inv(K)
    RT1 = _bmm(K_inv, P1)
    RT2 = _bmm(K_inv, P2)
    ones = jnp.ones((b, n, 1), match.dtype)
    pts1 = jnp.concatenate([match[..., :2], ones], -1)
    pts2 = jnp.concatenate([match[..., 2:], ones], -1)

    def rays(RT, pts):
        Rt = jnp.swapaxes(RT[:, :, :3], 1, 2)
        d = jnp.einsum("bij,bjk,bnk->bni", Rt, K_inv, pts, precision=_HI)
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
        origin = -jnp.einsum("bij,bj->bi", Rt, RT[:, :, 3], precision=_HI)
        return d, origin

    ray1_dir, ray1_origin = rays(RT1, pts1)
    ray2_dir, ray2_origin = rays(RT2, pts2)
    p1p2 = (ray1_origin - ray2_origin)[:, None, :]
    verline = (
        ray2_origin[:, None, :]
        + jnp.sum(p1p2 * ray2_dir, axis=-1, keepdims=True) * ray2_dir
        - ray1_origin[:, None, :]
    )
    cosv = jnp.sum(ray1_dir * verline, axis=-1, keepdims=True) / (
        (jnp.linalg.norm(ray1_dir, axis=-1, keepdims=True) + 1e-12)
        * (jnp.linalg.norm(verline, axis=-1, keepdims=True) + 1e-12)
    )
    return jax.lax.stop_gradient((cosv > thres).astype(match.dtype))


class TriangulationPoseModel(nn.Module):
    """Flow + depth nets with two-view geometric pose/structure recovery."""

    num_scales: int = 3
    ransac_iters: int = 100
    ransac_points: int = 6000
    inlier_thres: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        self.fpyramid = FeaturePyramid(dtype=self.dtype)
        self.pwc = PWCDecoder(dtype=self.dtype)
        self.depth_net = DepthNet(num_scales=self.num_scales, dtype=self.dtype)

    def inference(self, img1, img2, K, K_inv, rng=None):
        """Two-view inference (test.py:33,64 surface).

        Returns (flow, disp1, disp2, Rt, P2, triangulated depth at sampled
        points).
        """
        hw = (img1.shape[1], img1.shape[2])
        f1, f2 = self.fpyramid(img1), self.fpyramid(img2)
        flow = self.pwc(f1, f2, hw)[0]

        disp1 = self.depth_net(img1, False)[0]
        disp2 = self.depth_net(img2, False)[0]

        key = rng if rng is not None else jax.random.PRNGKey(0)
        matches = build_matches(flow)  # [B,N,4]
        b, n, _ = matches.shape
        sel, _ = random_sample(
            key, matches, jnp.zeros((b, n, 1), flow.dtype), self.ransac_points
        )
        F, _inl = batched_ransac_fundamental(
            key, sel[..., :2], sel[..., 2:], iters=self.ransac_iters, thres=self.inlier_thres
        )
        verify, _ = random_sample(key, sel, jnp.zeros((b, self.ransac_points, 1), flow.dtype), 200)
        P1, P2, Rt = pose_from_fundamental(F, K, verify)

        points = midpoint_triangulate(sel, K_inv, P1, P2)
        _, tri_depth = reproject(P1, points)
        return flow, disp1, disp2, Rt, P2, (sel, tri_depth)

    def triangulation_depth_loss(self, img1, img2, K, K_inv, rng=None):
        """Triangulated-depth registration loss on the sampled matches
        (model_depth_pose.py:331-380's core objective, with on-device geometry)."""
        flow, disp1, disp2, Rt, P2, (sel, tri_depth) = self.inference(
            img1, img2, K, K_inv, rng
        )
        P1 = _bmm(K, jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1), K.shape[:1] + (3, 4)
        ))
        weights = ray_angle_weights(sel, K, P1, P2)
        c1, d1 = reproject(P1, midpoint_triangulate(sel, K_inv, P1, P2))
        _, inter1 = register_depth(disp2depth(disp1), c1, d1)
        per_point = (1.0 - inter1 / (d1 + 1e-12)) ** 2 * weights
        denom = jnp.mean(weights.astype(jnp.float32), axis=(1, 2)) + 1e-12
        return jnp.mean(per_point.astype(jnp.float32), axis=(1, 2)) / denom
