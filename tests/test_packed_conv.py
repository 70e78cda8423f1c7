"""Space-to-depth packed convs: exact equivalence with the plain layers.

The packed mode (ops/packed_conv.py) is a pure layout optimization: same
parameter tree (pinned child names, logical kernels), same math up to f32
contraction-order roundoff. These tests pin that invariant for the raw ops,
the layer wrappers, and the whole DepthNet / FeaturePyramid modules --
including the reflection-padding border construction the decoder depends on
(/root/reference/core/networks/structures/depth_model.py:111-126).
"""

import jax
import jax.numpy as jnp
import numpy as np

from unsupervised_depth_opticalflow_egomotion_tpu.models.depth_net import DepthNet
from unsupervised_depth_opticalflow_egomotion_tpu.models.feature_pyramid import (
    FeaturePyramid,
)
from unsupervised_depth_opticalflow_egomotion_tpu.ops.packed_conv import (
    depth_to_space,
    packed_conv,
    packed_conv_reflect,
    space_to_depth,
)


def test_pack_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 12, 5), jnp.float32)
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))), x)


def test_packed_conv_matches_plain():
    rng = np.random.RandomState(1)
    for h, w, ci, co, stride in [(8, 12, 5, 7, 1), (16, 8, 3, 16, 2), (4, 8, 2, 1, 1)]:
        x = jnp.asarray(rng.randn(2, h, w, ci), jnp.float32)
        wt = jnp.asarray(rng.randn(3, 3, ci, co), jnp.float32)
        b = jnp.asarray(rng.randn(co), jnp.float32)
        ref = (
            jax.lax.conv_general_dilated(
                x, wt, (stride, stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + b
        )
        got = depth_to_space(packed_conv(space_to_depth(x), wt, b, stride))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_packed_reflect_conv_matches_plain():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 12, 6), jnp.float32)
    wt = jnp.asarray(rng.randn(3, 3, 6, 4), jnp.float32)
    b = jnp.asarray(rng.randn(4), jnp.float32)
    xr = jnp.concatenate([x[:, 1:2], x, x[:, -2:-1]], axis=1)
    xr = jnp.concatenate([xr[:, :, 1:2], xr, xr[:, :, -2:-1]], axis=2)
    ref = (
        jax.lax.conv_general_dilated(
            xr, wt, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + b
    )
    got = depth_to_space(packed_conv_reflect(space_to_depth(x), wt, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def _same_tree(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, leaf in fa:
        assert path in fb, f"param {path} missing in packed tree"
        assert leaf.shape == fb[path].shape


def test_depth_net_packed_equivalence():
    img = jnp.asarray(np.random.RandomState(3).rand(2, 64, 128, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    plain = DepthNet(num_scales=3, packed=False)
    packd = DepthNet(num_scales=3, packed=True)
    v0 = plain.init(key, img, False)
    v1 = packd.init(key, img, False)
    _same_tree(v0["params"], v1["params"])  # identical tree -> identical init
    out0 = plain.apply(v0, img, False)
    out1 = packd.apply(v1, img, False)
    for a, b in zip(out0, out1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_feature_pyramid_packed_equivalence():
    img = jnp.asarray(np.random.RandomState(4).rand(2, 64, 128, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    plain = FeaturePyramid(packed=False)
    packd = FeaturePyramid(packed=True)
    v0 = plain.init(key, img)
    v1 = packd.init(key, img)
    _same_tree(v0["params"], v1["params"])
    out0 = plain.apply(v0, img)
    out1 = packd.apply(v1, img)
    assert len(out0) == len(out1) == 6
    for a, b in zip(out0, out1):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def _reflect_conv_ref(x, wt, b):
    xr = jnp.concatenate([x[:, 1:2], x, x[:, -2:-1]], axis=1)
    xr = jnp.concatenate([xr[:, :, 1:2], xr, xr[:, :, -2:-1]], axis=2)
    return (
        jax.lax.conv_general_dilated(
            xr, wt, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + b
    )


def test_rect_pack_roundtrip_and_repack():
    from unsupervised_depth_opticalflow_egomotion_tpu.ops.packed_conv import (
        depth_to_space_rect,
        repack_22_to_24,
        space_to_depth_rect,
    )

    x = jnp.asarray(np.random.RandomState(5).randn(2, 8, 16, 5), jnp.float32)
    xp = space_to_depth_rect(x, 2, 4)
    np.testing.assert_array_equal(np.asarray(depth_to_space_rect(xp, 2, 4)), x)
    # repack from (2,2) to (2,4) is the same logical tensor
    np.testing.assert_array_equal(
        np.asarray(repack_22_to_24(space_to_depth(x))), np.asarray(xp)
    )


def test_rect_packed_reflect_conv_matches_plain():
    from unsupervised_depth_opticalflow_egomotion_tpu.ops.packed_conv import (
        depth_to_space_rect,
        packed_conv_reflect_rect,
        space_to_depth_rect,
    )

    rng = np.random.RandomState(6)
    for h, w, ci, co in [(8, 16, 5, 7), (6, 8, 16, 1), (4, 12, 3, 16)]:
        x = jnp.asarray(rng.randn(2, h, w, ci), jnp.float32)
        wt = jnp.asarray(rng.randn(3, 3, ci, co), jnp.float32)
        b = jnp.asarray(rng.randn(co), jnp.float32)
        ref = _reflect_conv_ref(x, wt, b)
        got = depth_to_space_rect(
            packed_conv_reflect_rect(space_to_depth_rect(x, 2, 4), wt, b, 2, 4),
            2,
            4,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_packed_upsample_24_matches_plain():
    from unsupervised_depth_opticalflow_egomotion_tpu.ops.interp import (
        upsample2x_bilinear,
    )
    from unsupervised_depth_opticalflow_egomotion_tpu.ops.packed_conv import (
        depth_to_space_rect,
        packed_upsample2x_bilinear_24,
        space_to_depth_rect,
    )

    x = jnp.asarray(np.random.RandomState(7).randn(2, 10, 16, 3), jnp.float32)
    got = depth_to_space_rect(
        packed_upsample2x_bilinear_24(space_to_depth_rect(x, 2, 4)), 2, 4
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(upsample2x_bilinear(x)), atol=1e-6
    )


def test_rect_packed_zero_conv_matches_plain():
    from unsupervised_depth_opticalflow_egomotion_tpu.ops.packed_conv import (
        depth_to_space_rect,
        packed_conv_rect,
        space_to_depth_rect,
    )

    rng = np.random.RandomState(8)
    for (fy, fx), h, w, ci, co in [
        ((1, 2), 8, 16, 5, 7),
        ((2, 2), 8, 12, 6, 4),
        ((1, 2), 6, 8, 64, 64),
        ((2, 4), 8, 16, 3, 5),
    ]:
        x = jnp.asarray(rng.randn(2, h, w, ci), jnp.float32)
        wt = jnp.asarray(rng.randn(3, 3, ci, co), jnp.float32)
        b = jnp.asarray(rng.randn(co), jnp.float32)
        ref = (
            jax.lax.conv_general_dilated(
                x, wt, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + b
        )
        got = depth_to_space_rect(
            packed_conv_rect(space_to_depth_rect(x, fy, fx), wt, b, fy, fx),
            fy,
            fx,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_packed_batchnorm_matches_flax():
    import flax.linen as nn

    from unsupervised_depth_opticalflow_egomotion_tpu.models.layers import (
        PackedBatchNorm,
    )
    from unsupervised_depth_opticalflow_egomotion_tpu.ops.packed_conv import (
        depth_to_space_rect,
        space_to_depth_rect,
    )

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(4, 8, 12, 6) * 3 + 1.5, jnp.float32)
    ref_bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    variables = ref_bn.init(jax.random.PRNGKey(0), x)
    # make scale/bias nontrivial
    variables = {
        "params": {
            "scale": jnp.asarray(rng.rand(6) + 0.5, jnp.float32),
            "bias": jnp.asarray(rng.randn(6), jnp.float32),
        },
        "batch_stats": variables["batch_stats"],
    }
    ref_y, ref_upd = ref_bn.apply(variables, x, mutable=["batch_stats"])

    for fy, fx in [(1, 2), (2, 2)]:
        xp = space_to_depth_rect(x, fy, fx)
        bn = PackedBatchNorm(
            use_running_average=False, phases=fy * fx, momentum=0.9, epsilon=1e-5
        )
        y, upd = bn.apply(variables, xp, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(depth_to_space_rect(y, fy, fx)), np.asarray(ref_y), atol=1e-5
        )
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(upd["batch_stats"][k]),
                np.asarray(ref_upd["batch_stats"][k]),
                atol=1e-5,
            )
        # eval mode uses the running stats
        bn_eval = PackedBatchNorm(use_running_average=True, phases=fy * fx)
        ref_eval = ref_bn.copy(use_running_average=True)
        np.testing.assert_allclose(
            np.asarray(
                depth_to_space_rect(bn_eval.apply(variables, xp), fy, fx)
            ),
            np.asarray(ref_eval.apply(variables, x)),
            atol=1e-5,
        )


def test_packed_encoder_matches_plain():
    from unsupervised_depth_opticalflow_egomotion_tpu.models.depth_net import (
        ResNet18Encoder,
    )

    rng = np.random.RandomState(10)
    img = jnp.asarray(rng.rand(2, 64, 96, 3), jnp.float32)
    plain = ResNet18Encoder()
    packed = ResNet18Encoder(packed_layer1=True)
    variables = plain.init(jax.random.PRNGKey(1), img, True)
    v2 = packed.init(jax.random.PRNGKey(1), img, True)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    for tree, tree2 in ((variables["params"], v2["params"]),):
        s1 = jax.tree_util.tree_map(lambda a: a.shape, tree)
        s2 = jax.tree_util.tree_map(lambda a: a.shape, tree2)
        assert s1 == s2
    ref_feats, ref_upd = plain.apply(
        variables, img, True, mutable=["batch_stats"]
    )
    got_feats, got_upd = packed.apply(
        variables, img, True, mutable=["batch_stats"]
    )
    for r, g in zip(ref_feats, got_feats):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4
        ),
        ref_upd["batch_stats"],
        got_upd["batch_stats"],
    )


def test_packed_stem_conv_matches_plain():
    from unsupervised_depth_opticalflow_egomotion_tpu.ops.packed_conv import (
        packed_stem_conv,
    )

    rng = np.random.RandomState(11)
    for h, w, ci, co in [(16, 24, 3, 8), (8, 16, 2, 5)]:
        x = jnp.asarray(rng.randn(2, h, w, ci), jnp.float32)
        wt = jnp.asarray(rng.randn(7, 7, ci, co), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, wt, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = packed_stem_conv(x, wt)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_packed_stem_encoder_matches_plain():
    from unsupervised_depth_opticalflow_egomotion_tpu.models.depth_net import (
        ResNet18Encoder,
    )

    rng = np.random.RandomState(12)
    img = jnp.asarray(rng.rand(2, 64, 96, 3), jnp.float32)
    plain = ResNet18Encoder()
    packed = ResNet18Encoder(packed_stem=True, packed_layer1=True)
    variables = plain.init(jax.random.PRNGKey(2), img, True)
    v2 = packed.init(jax.random.PRNGKey(2), img, True)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    ref_feats = plain.apply(variables, img, True, mutable=["batch_stats"])[0]
    got_feats = packed.apply(variables, img, True, mutable=["batch_stats"])[0]
    for r, g in zip(ref_feats, got_feats):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=5e-4)
