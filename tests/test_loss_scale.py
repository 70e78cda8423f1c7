"""Half-resolution loss dial (``loss_base_scale``).

The dial rebases the whole training-loss pyramid one octave below the input
resolution (Config.loss_base_scale; JointModel docs). These tests pin its
contracts:

- all three objectives stay well-formed at loss_base_scale=1: same loss keys,
  finite values, and gradients reach every sub-network that the scale-0 graph
  trains (the half-res graph must not silently disconnect a net);
- the parameter tree is a strict SUPERSET of the default tree (the extra
  coarse disp head gets a new name, every existing name/shape is unchanged),
  so checkpoints graft by name across the dial in both directions;
- inference paths (full-res disp head) still exist and produce full-res
  output under the dial.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unsupervised_depth_opticalflow_egomotion_tpu.models import JointModel

H, W = 64, 128
B = 2
KEY = jax.random.PRNGKey(0)


def dummy_batch():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, 3 * H, W, 3).astype(np.float32))
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    K_ms = np.stack(
        [np.diag([1 / 2**s, 1 / 2**s, 1.0]).astype(np.float32) @ K for s in range(3)]
    )
    K_inv_ms = np.stack([np.linalg.inv(k) for k in K_ms])
    return (
        images,
        jnp.asarray(np.tile(K_ms[None], (B, 1, 1, 1))),
        jnp.asarray(np.tile(K_inv_ms[None], (B, 1, 1, 1))),
    )


@pytest.fixture(scope="module")
def batch():
    return dummy_batch()


@pytest.fixture(scope="module")
def ls1_model(batch):
    model = JointModel(num_scales=3, loss_base_scale=1)
    images, K_ms, K_inv_ms = batch

    @jax.jit
    def init(key, images, K_ms, K_inv_ms):
        return model.init(
            key, images, K_ms, K_inv_ms, train=False, method=model.forward_geom
        )

    return model, init(KEY, images, K_ms, K_inv_ms)


def _flat_shapes(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {
        "/".join(str(getattr(p, "key", p)) for p in path): leaf.shape
        for path, leaf in flat
    }


def test_param_tree_superset(batch, ls1_model):
    images, K_ms, K_inv_ms = batch
    base = JointModel(num_scales=3)

    @jax.jit
    def init(key, images, K_ms, K_inv_ms):
        return base.init(
            key, images, K_ms, K_inv_ms, train=False, method=base.forward_geom
        )

    v0 = init(KEY, images, K_ms, K_inv_ms)
    _, v1 = ls1_model
    s0, s1 = _flat_shapes(v0["params"]), _flat_shapes(v1["params"])
    for name, shape in s0.items():
        assert name in s1, f"missing under loss_base_scale=1: {name}"
        assert s1[name] == shape, name
    extra = set(s1) - set(s0)
    assert extra, "loss_base_scale=1 must add the coarse disp head"
    assert all("ReflectConv3x3_x3" in n for n in extra), extra


def test_forward_geom_half_res(batch, ls1_model):
    images, K_ms, K_inv_ms = batch
    model, variables = ls1_model

    @jax.jit
    def fwd(variables, images, K_ms, K_inv_ms):
        return model.apply(
            variables, images, K_ms, K_inv_ms, train=True, with_masks=True,
            method=model.forward_geom, mutable=["batch_stats"],
        )

    (loss_pack, aux), _ = fwd(variables, images, K_ms, K_inv_ms)
    for name, v in loss_pack.items():
        assert v.shape == (B,), name
        assert np.all(np.isfinite(np.asarray(v))), name
    # masks/disp/flow live on the half-res grid
    assert aux["pred_disp"].shape == (B, H // 2, W // 2, 1)
    assert aux["pred_flow_fwd"].shape == (B, H // 2, W // 2, 2)
    assert aux["fwd_mask"].shape == (B, H // 2, W // 2, 1)

    # gradients reach every sub-network the scale-0 graph trains
    @jax.jit
    def grads(params, images, K_ms, K_inv_ms):
        def loss_fn(p):
            (lp, _), _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                images, K_ms, K_inv_ms, train=True,
                method=model.forward_geom, mutable=["batch_stats"],
            )
            live = [v for k, v in sorted(lp.items())]
            return jnp.sum(jnp.stack(live))

        return jax.grad(loss_fn)(params)

    g = grads(variables["params"], images, K_ms, K_inv_ms)
    for net in ("depth_net", "pose_net", "fpyramid", "pwc"):
        norm = sum(
            float(jnp.sum(jnp.abs(x.astype(jnp.float32))))
            for x in jax.tree_util.tree_leaves(g[net])
        )
        assert np.isfinite(norm) and norm > 0, net


def test_inference_full_res_under_dial(batch, ls1_model):
    """The full-res disp head survives the dial: infer paths are unchanged."""
    images, _, _ = batch
    model, variables = ls1_model
    img = images[:, :H]

    disp = jax.jit(
        lambda v, x: model.apply(v, x, method=model.infer_disp)
    )(variables, img)
    assert disp.shape == (B, H, W, 1)
    assert np.all(np.isfinite(np.asarray(disp)))


@pytest.mark.parametrize("mode", ["forward_flow", "forward_depth"])
def test_other_modes_half_res(batch, mode):
    images, K_ms, K_inv_ms = batch
    model = JointModel(num_scales=3, loss_base_scale=1)
    method = getattr(model, mode)

    @jax.jit
    def run(key, images, K_ms, K_inv_ms):
        variables = model.init(
            key, images, K_ms, K_inv_ms, train=False, method=method
        )
        out = model.apply(
            variables, images, K_ms, K_inv_ms, train=True,
            method=method, mutable=["batch_stats"],
        )[0]
        return out

    loss_pack = run(KEY, images, K_ms, K_inv_ms)
    for name, v in loss_pack.items():
        assert v.shape == (B,), name
        assert np.all(np.isfinite(np.asarray(v))), name


def test_scale_budget_validated():
    model = JointModel(num_scales=3, loss_base_scale=2)
    images, K_ms, K_inv_ms = dummy_batch()
    with pytest.raises(ValueError, match="loss_base_scale"):
        model.init(
            KEY, images, K_ms, K_inv_ms, train=False,
            method=model.forward_geom,
        )
