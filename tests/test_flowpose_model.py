"""Tests for the legacy flow-to-pose model family + attention modules."""

import numpy as np
import jax
import jax.numpy as jnp

from unsupervised_depth_opticalflow_egomotion_tpu.models import (
    ChannelAttention,
    FlowPoseModel,
    PositionAttention,
)

H, W = 64, 128


def test_attention_modules_shapes():
    x = jnp.zeros((2, 8, 16, 32))
    for cls in (PositionAttention, ChannelAttention):
        m = cls()
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        y = jax.jit(m.apply)(p, x)
        assert y.shape == x.shape
        # gamma starts at 0 -> identity
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_flowpose_model_train_losses():
    model = FlowPoseModel()
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 2 * H, W, 3).astype(np.float32))
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    K_ms = jnp.asarray(np.tile(K[None, None], (2, 1, 1, 1)))
    K_inv = jnp.asarray(np.tile(np.linalg.inv(K)[None, None], (2, 1, 1, 1)))

    @jax.jit
    def init(key):
        return model.init(key, images, K_ms, K_inv, train=False, method=model.forward_train)

    variables = init(jax.random.PRNGKey(0))

    @jax.jit
    def fwd(v):
        return model.apply(
            v, images, K_ms, K_inv, train=True, method=model.forward_train,
            mutable=["batch_stats"],
        )

    losses, _ = fwd(variables)
    assert set(losses) == {"loss_depth_pixel", "loss_depth_consis", "loss_depth_smooth"}
    for k, v in losses.items():
        assert v.shape == (2,) and np.all(np.isfinite(np.asarray(v))), k


def test_flowpose_infer_pose_shape():
    model = FlowPoseModel()
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))

    @jax.jit
    def init(key):
        return model.init(key, img1, img2, method=model.infer_pose)

    variables = init(jax.random.PRNGKey(0))
    pose = jax.jit(lambda v: model.apply(v, img1, img2, method=model.infer_pose))(variables)
    assert pose.shape == (1, 6)
