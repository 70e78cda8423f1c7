"""Train-step smoke tests: single device and 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unsupervised_depth_opticalflow_egomotion_tpu.config import Config
from unsupervised_depth_opticalflow_egomotion_tpu.parallel import (
    init_state,
    make_mesh,
    make_optimizer,
    make_train_step,
    shard_batch,
)

H, W = 64, 128


def small_cfg(**kw):
    base = dict(img_hw=(H, W), compute_dtype="float32", batch_size=2)
    base.update(kw)
    return Config(**base)


def make_batch(b):
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, 3 * H, W, 3).astype(np.float32))
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    K_ms = np.stack([np.diag([1 / 2**s, 1 / 2**s, 1.0]).astype(np.float32) @ K for s in range(3)])
    K_inv_ms = np.stack([np.linalg.inv(k) for k in K_ms])
    return (
        images,
        jnp.asarray(np.tile(K_ms[None], (b, 1, 1, 1))),
        jnp.asarray(np.tile(K_inv_ms[None], (b, 1, 1, 1))),
    )


@pytest.mark.parametrize("mode", ["flow", "depth", "geom"])
def test_single_device_step(mode):
    cfg = small_cfg(mode=mode)
    model, state = init_state(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, state.params)
    step = make_train_step(model, cfg, tx)
    batch = make_batch(2)
    # flow mode only trains fpyramid+pwc; check a leaf that gets gradients
    net = "pwc" if mode == "flow" else "depth_net"
    p0 = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(state.params[net])]
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss_total"]))
    p1 = jax.tree_util.tree_leaves(state.params[net])
    assert any(not np.allclose(a, np.asarray(b)) for a, b in zip(p0, p1))


def test_mesh_step_8dev():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    cfg = small_cfg(mode="geom", batch_size=8)
    mesh = make_mesh(8)
    model, state = init_state(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, state.params)
    step = make_train_step(model, cfg, tx, mesh=mesh)
    batch = shard_batch(make_batch(8), mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(state.step) == 1


def test_param_freezing():
    cfg = small_cfg(mode="geom", fix_flow=True)
    model, state = init_state(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, state.params)
    step = make_train_step(model, cfg, tx)
    frozen_before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.params["pwc"])
    depth_before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.params["depth_net"])
    state, _ = step(state, make_batch(2), jax.random.PRNGKey(1))
    frozen_after = state.params["pwc"]
    # pwc params unchanged, depth params updated
    for a, b in zip(jax.tree_util.tree_leaves(frozen_before), jax.tree_util.tree_leaves(frozen_after)):
        np.testing.assert_array_equal(a, np.asarray(b))
    changed = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(depth_before),
            jax.tree_util.tree_leaves(state.params["depth_net"]),
        )
    )
    assert changed
