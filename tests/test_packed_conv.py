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
