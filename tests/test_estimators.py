"""Tests for on-device RANSAC-F, PnP, triangulation, and sampling ops."""

import numpy as np
import jax
import jax.numpy as jnp

from unsupervised_depth_opticalflow_egomotion_tpu.ops import geometry
from unsupervised_depth_opticalflow_egomotion_tpu.ops.pnp import (
    batched_pnp,
    pnp_gauss_newton,
    pnp_ransac,
    rodrigues,
)
from unsupervised_depth_opticalflow_egomotion_tpu.ops.ransac import (
    batched_ransac_fundamental,
    eight_point,
    ransac_fundamental,
    sampson_distance,
)
from unsupervised_depth_opticalflow_egomotion_tpu.ops.sampling import (
    build_matches,
    sample_matches,
    top_ratio_sample,
)
from unsupervised_depth_opticalflow_egomotion_tpu.ops.triangulation import (
    midpoint_triangulate,
    reproject,
)


def synth_scene(n=64, seed=0, noise=0.0):
    """Random 3D points seen by two cameras with a known relative pose."""
    rng = np.random.RandomState(seed)
    K = np.array([[200.0, 0, 100.0], [0, 200.0, 80.0], [0, 0, 1]], np.float32)
    pose = np.array([0.3, -0.1, 0.2, 0.02, -0.03, 0.05], np.float32)  # [t|r]
    R = np.asarray(geometry.euler2mat(jnp.asarray(pose[None, 3:])))[0]
    t = pose[:3]
    pts3d = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 10, n)], 1
    ).astype(np.float32)

    def project(P3, Rm, tv):
        cam = P3 @ Rm.T + tv
        uv = cam @ K.T
        return (uv[:, :2] / uv[:, 2:3]).astype(np.float32)

    p1 = project(pts3d, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    p2 = project(pts3d, R, t)
    if noise:
        p1 = p1 + rng.randn(*p1.shape).astype(np.float32) * noise
        p2 = p2 + rng.randn(*p2.shape).astype(np.float32) * noise
    return K, pose, R, t, pts3d, p1, p2


class TestEightPoint:
    def test_exact_correspondences(self):
        K, pose, R, t, pts3d, p1, p2 = synth_scene()
        F = np.asarray(eight_point(jnp.asarray(p1), jnp.asarray(p2)))
        d = np.asarray(sampson_distance(jnp.asarray(F), jnp.asarray(p1), jnp.asarray(p2)))
        assert np.max(d) < 1e-2

    def test_ransac_rejects_outliers(self):
        K, pose, R, t, pts3d, p1, p2 = synth_scene(n=128)
        rng = np.random.RandomState(1)
        p2_corrupt = p2.copy()
        outlier_idx = rng.choice(128, 30, replace=False)
        p2_corrupt[outlier_idx] += rng.uniform(20, 60, (30, 2)).astype(np.float32)
        F, inliers = ransac_fundamental(
            jax.random.PRNGKey(0), jnp.asarray(p1), jnp.asarray(p2_corrupt), iters=100, thres=0.5
        )
        inliers = np.asarray(inliers)
        # most outliers flagged, most inliers kept
        assert inliers[outlier_idx].mean() < 0.2
        keep = np.setdiff1d(np.arange(128), outlier_idx)
        assert inliers[keep].mean() > 0.8

    def test_batched(self):
        K, pose, R, t, pts3d, p1, p2 = synth_scene(n=64)
        P1 = jnp.asarray(np.stack([p1, p1]))
        P2 = jnp.asarray(np.stack([p2, p2]))
        Fs, inl = batched_ransac_fundamental(jax.random.PRNGKey(0), P1, P2, iters=20)
        assert Fs.shape == (2, 3, 3) and inl.shape == (2, 64)


class TestPnP:
    def test_rodrigues_matches_euler_small(self):
        r = np.asarray(rodrigues(jnp.zeros(3)))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-6)

    def test_gauss_newton_recovers_pose(self):
        K, pose, R, t, pts3d, p1, p2 = synth_scene()
        params = np.asarray(
            pnp_gauss_newton(jnp.asarray(pts3d), jnp.asarray(p2), jnp.asarray(K), num_iters=20)
        )
        R_est = np.asarray(rodrigues(jnp.asarray(params[:3])))
        np.testing.assert_allclose(R_est, R, atol=1e-3)
        np.testing.assert_allclose(params[3:], t, atol=1e-3)

    def test_ransac_pnp_with_outliers(self):
        K, pose, R, t, pts3d, p1, p2 = synth_scene(n=96)
        rng = np.random.RandomState(2)
        p2c = p2.copy()
        bad = rng.choice(96, 20, replace=False)
        p2c[bad] += rng.uniform(30, 80, (20, 2)).astype(np.float32)
        params, inliers = pnp_ransac(
            jax.random.PRNGKey(0), jnp.asarray(pts3d), jnp.asarray(p2c), jnp.asarray(K),
            iters=50, thres=2.0,
        )
        # Note: final refit uses all points; hypothesis selection should still
        # have found a mostly-inlier model.
        assert np.asarray(inliers)[bad].mean() < 0.3

    def test_batched_pnp_output_convention(self):
        K, pose, R, t, pts3d, p1, p2 = synth_scene()
        out = np.asarray(
            batched_pnp(
                jnp.asarray(pts3d[None]), jnp.asarray(p2[None]), jnp.asarray(K[None]), num_iters=20
            )
        )
        # [tvec | rvec] ordering (reference pnp() convention)
        np.testing.assert_allclose(out[0, :3], t, atol=1e-3)


class TestTriangulation:
    def test_midpoint_recovers_depth(self):
        K, pose, R, t, pts3d, p1, p2 = synth_scene()
        Kj = jnp.asarray(K[None])
        P1, P2 = geometry.projection_matrices(jnp.asarray(pose[None]), Kj)
        match = jnp.asarray(np.concatenate([p1, p2], axis=1)[None])  # [1,N,4]
        points = midpoint_triangulate(match, jnp.linalg.inv(Kj), P1, P2)
        np.testing.assert_allclose(np.asarray(points)[0, :, :3], pts3d, atol=1e-2)
        coord, depth = reproject(P1, points)
        np.testing.assert_allclose(np.asarray(coord)[0], p1, atol=1e-2)
        np.testing.assert_allclose(np.asarray(depth)[0, :, 0], pts3d[:, 2], atol=1e-2)


class TestSampling:
    def test_build_matches(self):
        flow = jnp.asarray(np.ones((1, 4, 5, 2), np.float32))
        m = np.asarray(build_matches(flow))
        assert m.shape == (1, 20, 4)
        np.testing.assert_allclose(m[0, :, 2], m[0, :, 0] + 1)

    def test_top_ratio_keeps_best(self):
        match = jnp.asarray(np.arange(40, dtype=np.float32).reshape(1, 10, 4))
        depth = jnp.asarray(np.arange(10, dtype=np.float32).reshape(1, 10, 1))
        scores = jnp.asarray(np.arange(10, dtype=np.float32).reshape(1, 10))
        m, d, s = top_ratio_sample(match, depth, scores, 0.3)
        assert m.shape == (1, 3, 4)
        np.testing.assert_array_equal(np.asarray(s)[0], [9, 8, 7])

    def test_sample_matches_shapes(self):
        flow = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 2).astype(np.float32))
        depth = jnp.ones((2, 8, 8, 1), jnp.float32)
        scores = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 1).astype(np.float32))
        m, d = sample_matches(jax.random.PRNGKey(0), flow, depth, scores, 0.3, 10)
        assert m.shape == (2, 10, 4) and d.shape == (2, 10, 1)
