"""Staged-training hand-off: flow-stage checkpoint grafted into a geom state."""

import numpy as np
import jax
import pytest

from unsupervised_depth_opticalflow_egomotion_tpu.config import Config
from unsupervised_depth_opticalflow_egomotion_tpu.parallel import init_state
from unsupervised_depth_opticalflow_egomotion_tpu.utils import CheckpointManager, graft_params


def test_graft_flow_stage_into_geom(tmp_path):
    cfg = Config(img_hw=(64, 128), compute_dtype="float32")
    _, flow_state = init_state(cfg, jax.random.PRNGKey(7))

    ckpt = CheckpointManager(str(tmp_path / "flow_ckpt"))
    ckpt.save(0, jax.device_get(flow_state))

    _, geom_state = init_state(cfg, jax.random.PRNGKey(99))
    donor = ckpt.restore(jax.device_get(geom_state))
    grafted = graft_params(geom_state.params, donor.params)

    # pwc/fpyramid subtrees must now match the flow stage exactly
    for net in ("pwc", "fpyramid", "depth_net", "pose_net"):
        a = jax.tree_util.tree_leaves(grafted[net])
        b = jax.tree_util.tree_leaves(donor.params[net])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # and differ from the fresh geom init (different seed)
    fresh = jax.tree_util.tree_leaves(geom_state.params["pwc"])
    new = jax.tree_util.tree_leaves(grafted["pwc"])
    assert any(not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(fresh, new))


def test_graft_partial_mismatch():
    """Donor with missing/mismatched leaves leaves target untouched there."""
    target = {"a": np.zeros((2, 2)), "b": np.zeros((3,))}
    donor = {"a": np.ones((2, 2)), "b": np.ones((4,))}  # b mismatched shape
    out = graft_params(target, donor)
    np.testing.assert_array_equal(out["a"], 1.0)
    np.testing.assert_array_equal(out["b"], 0.0)
