"""Shape/finiteness tests for the Flax networks and the joint loss graphs.

Every model invocation is jitted: eager (op-by-op) execution of these graphs
on the CPU test backend is orders of magnitude slower than one fused compile.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unsupervised_depth_opticalflow_egomotion_tpu.models import (
    DepthNet,
    FeaturePyramid,
    FlowPoseNet,
    JointModel,
    PoseNet,
    PWCDecoder,
)

H, W = 64, 128
B = 2
KEY = jax.random.PRNGKey(0)


def dummy_intrinsics(num_scales=3):
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    K_ms = np.stack([np.diag([1 / 2**s, 1 / 2**s, 1.0]).astype(np.float32) @ K for s in range(num_scales)])
    K_inv_ms = np.stack([np.linalg.inv(k) for k in K_ms])
    return (
        jnp.asarray(np.tile(K_ms[None], (B, 1, 1, 1))),
        jnp.asarray(np.tile(K_inv_ms[None], (B, 1, 1, 1))),
    )


def dummy_batch():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, 3 * H, W, 3).astype(np.float32))
    K_ms, K_inv_ms = dummy_intrinsics()
    return images, K_ms, K_inv_ms


class TestNetworks:
    def test_feature_pyramid_shapes(self):
        model = FeaturePyramid()
        x = jnp.zeros((B, H, W, 3))
        params = jax.jit(model.init)(KEY, x)
        feats = jax.jit(model.apply)(params, x)
        assert len(feats) == 6
        chans = [16, 32, 64, 96, 128, 196]
        for lvl, (f, c) in enumerate(zip(feats, chans), start=1):
            assert f.shape == (B, H // 2**lvl, W // 2**lvl, c)

    def test_pwc_decoder_shapes(self):
        fp = FeaturePyramid()
        x1 = jnp.zeros((B, H, W, 3))
        x2 = jnp.zeros((B, H, W, 3))
        fp_params = jax.jit(fp.init)(KEY, x1)
        f1 = jax.jit(fp.apply)(fp_params, x1)
        f2 = jax.jit(fp.apply)(fp_params, x2)
        dec = PWCDecoder()
        params = jax.jit(lambda k, a, b: dec.init(k, a, b, (H, W)))(KEY, f1, f2)
        flows = jax.jit(lambda p, a, b: dec.apply(p, a, b, (H, W)))(params, f1, f2)
        assert [f.shape for f in flows] == [
            (B, H, W, 2),
            (B, H // 2, W // 2, 2),
            (B, H // 4, W // 4, 2),
            (B, H // 8, W // 8, 2),
        ]

    def test_depth_net_shapes(self):
        model = DepthNet(num_scales=3)
        x = jnp.zeros((B, H, W, 3))
        variables = jax.jit(lambda k, a: model.init(k, a, train=False))(KEY, x)
        assert "batch_stats" in variables
        disps = jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, x)
        assert [d.shape for d in disps] == [
            (B, H, W, 1),
            (B, H // 2, W // 2, 1),
            (B, H // 4, W // 4, 1),
        ]
        d0 = np.asarray(disps[0])
        assert np.all(d0 > 0) and np.all(d0 < 1)

    def test_pose_net_shapes(self):
        model = PoseNet(num_input_frames=3)
        x = jnp.zeros((B, H, W, 9))
        params = jax.jit(model.init)(KEY, x)
        pose = jax.jit(model.apply)(params, x)
        assert pose.shape == (B, 2, 6)
        assert np.all(np.abs(np.asarray(pose)) < 1.0)

    def test_flowpose_net(self):
        model = FlowPoseNet()
        x = jnp.zeros((B, H, W, 2))
        params = jax.jit(model.init)(KEY, x)
        pose = jax.jit(model.apply)(params, x)
        assert pose.shape == (B, 6)


@pytest.fixture(scope="module")
def joint_model():
    model = JointModel(num_scales=3)
    images, K_ms, K_inv_ms = dummy_batch()

    @jax.jit
    def init(key, images, K_ms, K_inv_ms):
        return model.init(
            key, images, K_ms, K_inv_ms, train=False, method=model.forward_geom
        )

    variables = init(KEY, images, K_ms, K_inv_ms)
    return model, variables


class TestJointModel:
    def test_forward_geom_losses(self, joint_model):
        model, variables = joint_model
        images, K_ms, K_inv_ms = dummy_batch()

        @jax.jit
        def fwd(variables, images, K_ms, K_inv_ms):
            return model.apply(
                variables, images, K_ms, K_inv_ms, train=True,
                method=model.forward_geom, mutable=["batch_stats"],
            )

        (loss_pack, aux), _ = fwd(variables, images, K_ms, K_inv_ms)
        expected = {
            "loss_depth_pixel", "loss_depth_ssim", "loss_depth_smooth",
            "loss_depth_consis", "loss_flow_pixel", "loss_flow_ssim",
            "loss_flow_smooth", "loss_flow_consis", "loss_depth_flow_consis",
            "loss_epipolar", "loss_triangle", "loss_pnp", "loss_eight_point",
        }
        assert set(loss_pack) == expected
        for name, v in loss_pack.items():
            assert v.shape == (B,), name
            assert np.all(np.isfinite(np.asarray(v))), name
        for name in ("loss_depth_ssim", "loss_depth_consis", "loss_triangle",
                     "loss_pnp", "loss_eight_point"):
            np.testing.assert_array_equal(np.asarray(loss_pack[name]), 0.0)

    def test_optional_geom_losses_enabled(self):
        """enable_pnp / enable_eight_point / enable_triangle flip their losses
        non-zero and gradients flow into the pose net (VERDICT r1 item 4)."""
        model = JointModel(
            num_scales=3,
            enable_triangle=True,
            enable_pnp=True,
            enable_eight_point=True,
            ransac_iters=8,
            geometric_num=256,
        )
        images, K_ms, K_inv_ms = dummy_batch()

        @jax.jit
        def init(key, images, K_ms, K_inv_ms):
            return model.init(
                key, images, K_ms, K_inv_ms, rng=jax.random.PRNGKey(7),
                train=False, method=model.forward_geom,
            )

        variables = init(KEY, images, K_ms, K_inv_ms)

        @jax.jit
        def losses(params, images, K_ms, K_inv_ms):
            (loss_pack, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images, K_ms, K_inv_ms, rng=jax.random.PRNGKey(7),
                train=True, method=model.forward_geom, mutable=["batch_stats"],
            )
            return loss_pack

        pack = losses(variables["params"], images, K_ms, K_inv_ms)
        for name in ("loss_triangle", "loss_pnp", "loss_eight_point"):
            v = np.asarray(pack[name])
            assert np.all(np.isfinite(v)), name
            assert np.any(v != 0.0), name

        @jax.jit
        def pose_grad_norm(params, images, K_ms, K_inv_ms):
            def scalar(p):
                pack = losses(p, images, K_ms, K_inv_ms)
                return jnp.mean(pack["loss_pnp"]) + jnp.mean(pack["loss_eight_point"])

            g = jax.grad(scalar)(params)
            leaves = jax.tree_util.tree_leaves(
                {k: v for k, v in g.items() if "pose" in k}
            )
            return sum(jnp.sum(jnp.abs(l)) for l in leaves)

        gn = float(pose_grad_norm(variables["params"], images, K_ms, K_inv_ms))
        assert np.isfinite(gn) and gn > 0.0

    def test_forward_geom_requires_rng_when_sampling(self):
        model = JointModel(num_scales=3, enable_pnp=True, geometric_num=64, ransac_iters=4)
        images, K_ms, K_inv_ms = dummy_batch()
        with pytest.raises(ValueError, match="requires `rng`"):
            model.init(
                KEY, images, K_ms, K_inv_ms, train=False, method=model.forward_geom
            )

    def test_forward_flow_losses(self, joint_model):
        model, variables = joint_model
        images, K_ms, K_inv_ms = dummy_batch()

        @jax.jit
        def fwd(variables, images, K_ms, K_inv_ms):
            return model.apply(
                variables, images, K_ms, K_inv_ms, method=model.forward_flow
            )

        loss_pack = fwd(variables, images, K_ms, K_inv_ms)
        assert set(loss_pack) == {
            "loss_flow_pixel", "loss_flow_ssim", "loss_flow_smooth", "loss_flow_consis"
        }
        for name, v in loss_pack.items():
            assert v.shape == (B,) and np.all(np.isfinite(np.asarray(v))), name

    def test_forward_depth_losses(self, joint_model):
        model, variables = joint_model
        images, K_ms, K_inv_ms = dummy_batch()

        @jax.jit
        def fwd(variables, images, K_ms, K_inv_ms):
            return model.apply(
                variables, images, K_ms, K_inv_ms, train=True,
                method=model.forward_depth, mutable=["batch_stats"],
            )

        loss_pack, _ = fwd(variables, images, K_ms, K_inv_ms)
        for name in ("loss_depth_pixel", "loss_depth_smooth"):
            v = loss_pack[name]
            assert v.shape == (B,) and np.all(np.isfinite(np.asarray(v))), name

    def test_inference_methods(self, joint_model):
        model, variables = joint_model
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
        img2 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
        depth = jax.jit(lambda v, a: model.apply(v, a, method=model.infer_depth))(
            variables, img
        )
        assert depth.shape == (1, H, W, 1)
        assert np.all(np.asarray(depth) >= 0.1 - 1e-4)
        assert np.all(np.asarray(depth) <= 100.0 + 1e-3)
        flow = jax.jit(
            lambda v, a, b: model.apply(v, a, b, method=model.inference_flow)
        )(variables, img, img2)
        assert flow.shape == (1, H, W, 2)
        pose = jax.jit(lambda v, a: model.apply(v, a, method=model.infer_pose))(
            variables, jnp.concatenate([img, img, img2], -1)
        )
        assert pose.shape == (1, 2, 6)
