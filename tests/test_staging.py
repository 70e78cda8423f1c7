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


def test_schema_sidecar_roundtrip_and_layout_check(tmp_path):
    """save(meta=...) writes schema.json; restore(expect_opt_layout=...)
    rejects a layout mismatch up front with the actionable error."""
    from unsupervised_depth_opticalflow_egomotion_tpu.utils import opt_layout_tag

    cfg = Config(img_hw=(64, 128), compute_dtype="float32")
    _, state = init_state(cfg, jax.random.PRNGKey(7))
    tag = opt_layout_tag(fix_flow=True)
    assert tag == "multi_transform:flow"
    assert opt_layout_tag() == "flatten"
    assert opt_layout_tag(fix_depth=True, fix_pose=True) == "multi_transform:depth+pose"

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(3, jax.device_get(state), meta={"opt_layout": tag, "mode": "geom"})
    meta = CheckpointManager(str(tmp_path / "ckpt")).load_meta()
    assert meta["schema_version"] == 1
    assert meta["opt_layout"] == tag and meta["mode"] == "geom"

    fresh = CheckpointManager(str(tmp_path / "ckpt"))
    # matching layout restores fine
    restored = fresh.restore(jax.device_get(state), expect_opt_layout=tag)
    assert int(restored.step) == int(state.step)
    # mismatching layout fails BEFORE orbax, with the actionable message
    with pytest.raises(RuntimeError, match="optimizer layout"):
        fresh.restore(jax.device_get(state), expect_opt_layout="flatten")


def test_pre_versioning_checkpoint_skips_layout_check(tmp_path):
    """Checkpoints without a sidecar (rounds 1-3) restore unchecked."""
    cfg = Config(img_hw=(64, 128), compute_dtype="float32")
    _, state = init_state(cfg, jax.random.PRNGKey(7))
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(1, jax.device_get(state))  # no meta
    fresh = CheckpointManager(str(tmp_path / "ckpt"))
    assert fresh.load_meta() is None
    restored = fresh.restore(jax.device_get(state), expect_opt_layout="flatten")
    assert int(restored.step) == int(state.step)
