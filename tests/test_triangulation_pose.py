"""Tests for the legacy two-view triangulation-pose pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from unsupervised_depth_opticalflow_egomotion_tpu.models.triangulation_pose import (
    TriangulationPoseModel,
    essential_from_fundamental,
    pose_from_fundamental,
    ray_angle_weights,
)
from unsupervised_depth_opticalflow_egomotion_tpu.ops import geometry
from unsupervised_depth_opticalflow_egomotion_tpu.ops.ransac import eight_point


def synth_two_view(n=128, seed=0):
    rng = np.random.RandomState(seed)
    K = np.array([[200.0, 0, 100.0], [0, 200.0, 80.0], [0, 0, 1]], np.float32)
    pose = np.array([0.5, 0.05, 0.1, 0.01, -0.04, 0.02], np.float32)
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
    return K, R, t, pts3d, p1, p2


class TestPoseFromFundamental:
    def test_recovers_rotation_up_to_scale(self):
        K, R, t, pts3d, p1, p2 = synth_two_view()
        F = np.asarray(eight_point(jnp.asarray(p1), jnp.asarray(p2)))
        match = jnp.asarray(np.concatenate([p1, p2], axis=1)[None])
        P1, P2, Rt = pose_from_fundamental(
            jnp.asarray(F[None]), jnp.asarray(K[None]), match
        )
        Rt = np.asarray(Rt)[0]
        # rotation recovered exactly; translation up to scale
        np.testing.assert_allclose(Rt[:, :3], R, atol=1e-2)
        t_est = Rt[:, 3]
        cos = np.dot(t_est, t) / (np.linalg.norm(t_est) * np.linalg.norm(t))
        assert cos > 0.999

    def test_essential_roundtrip(self):
        K, R, t, pts3d, p1, p2 = synth_two_view()
        E_true = np.asarray(
            geometry.essential_matrix(
                jnp.asarray(np.concatenate([t, [0.01, -0.04, 0.02]])[None])
            )
        )[0]
        K_inv = np.linalg.inv(K)
        F = K_inv.T @ E_true @ K_inv
        E_back = np.asarray(
            essential_from_fundamental(jnp.asarray(F[None]), jnp.asarray(K[None]))
        )[0]
        # proportional (both unit-normalized directionally)
        ratio = E_back / (E_true + 1e-12)
        assert np.std(ratio) / (abs(np.mean(ratio)) + 1e-9) < 1e-3

    def test_ray_angle_weights_shapes(self):
        K, R, t, pts3d, p1, p2 = synth_two_view()
        match = jnp.asarray(np.concatenate([p1, p2], axis=1)[None])
        b = 1
        iden = jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1), (b, 3, 4)
        )
        Kj = jnp.asarray(K[None])
        P1 = Kj @ iden
        P2 = Kj @ jnp.asarray(np.concatenate([R, t[:, None]], -1)[None])
        w = ray_angle_weights(match, Kj, P1, P2)
        assert w.shape == (1, 128, 1)
        # a real baseline: most rays well conditioned
        assert float(np.asarray(w).mean()) > 0.9


class TestTriangulationPoseModel:
    def test_inference_shapes(self):
        H, W = 64, 128
        model = TriangulationPoseModel(ransac_iters=5, ransac_points=256)
        rng = np.random.RandomState(0)
        img1 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
        img2 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
        K = jnp.asarray(
            np.array([[[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]]], np.float32)
        )
        variables = jax.jit(
            lambda k: model.init(k, img1, img2, K, jnp.linalg.inv(K), method=model.inference)
        )(jax.random.PRNGKey(0))
        flow, disp1, disp2, Rt, P2, (sel, tri_depth) = jax.jit(
            lambda v: model.apply(v, img1, img2, K, jnp.linalg.inv(K), method=model.inference)
        )(variables)
        assert flow.shape == (1, H, W, 2)
        assert disp1.shape == (1, H, W, 1)
        assert Rt.shape == (1, 3, 4)
        assert sel.shape == (1, 256, 4)
        assert tri_depth.shape == (1, 256, 1)
        # Rt rotation must be orthonormal
        R = np.asarray(Rt)[0, :, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)
