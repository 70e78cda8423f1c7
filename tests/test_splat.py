"""Forward-splat op tests."""

import numpy as np
import jax.numpy as jnp

from unsupervised_depth_opticalflow_egomotion_tpu.ops.splat import (
    forward_splat,
    occlusion_mask_from_flow,
)


class TestForwardSplat:
    def test_integer_shift_moves_mass(self):
        v = np.zeros((1, 8, 8, 1), np.float32)
        v[0, 2, 2, 0] = 1.0
        flow = np.zeros((1, 8, 8, 2), np.float32)
        flow[..., 0] = 3.0  # shift right by 3
        out = np.asarray(forward_splat(jnp.asarray(v), jnp.asarray(flow)))
        assert out[0, 2, 5, 0] == 1.0
        assert out.sum() == 1.0

    def test_fractional_shift_bilinear_split(self):
        v = np.zeros((1, 8, 8, 1), np.float32)
        v[0, 4, 4, 0] = 1.0
        flow = np.zeros((1, 8, 8, 2), np.float32)
        flow[..., 0] = 0.25
        out = np.asarray(forward_splat(jnp.asarray(v), jnp.asarray(flow)))
        np.testing.assert_allclose(out[0, 4, 4, 0], 0.75, atol=1e-6)
        np.testing.assert_allclose(out[0, 4, 5, 0], 0.25, atol=1e-6)

    def test_out_of_frame_mass_dropped(self):
        v = np.ones((1, 4, 4, 1), np.float32)
        flow = np.full((1, 4, 4, 2), 10.0, np.float32)
        out = np.asarray(forward_splat(jnp.asarray(v), jnp.asarray(flow)))
        assert out.sum() == 0.0

    def test_occlusion_mask_zero_flow(self):
        flow = jnp.zeros((1, 6, 6, 2))
        mask = np.asarray(occlusion_mask_from_flow(flow))
        np.testing.assert_allclose(mask, 1.0)

    def test_occlusion_mask_converging_flow(self):
        # All pixels map to the center: everything except the center's
        # neighborhood receives no mass -> occluded.
        h = w = 9
        flow = np.zeros((1, h, w, 2), np.float32)
        for y in range(h):
            for x in range(w):
                flow[0, y, x] = [4 - x, 4 - y]
        mask = np.asarray(occlusion_mask_from_flow(jnp.asarray(flow)))
        assert mask[0, 4, 4, 0] == 1.0
        assert mask.sum() < h * w * 0.2


class TestNearestSplat:
    def test_matches_bilinear_mask_on_integer_flow(self):
        rng = np.random.RandomState(0)
        flow = jnp.asarray(
            rng.randint(-3, 4, (2, 8, 12, 2)).astype(np.float32)
        )
        bil = occlusion_mask_from_flow(flow, "bilinear")
        nn = occlusion_mask_from_flow(flow, "nearest")
        np.testing.assert_array_equal(np.asarray(bil), np.asarray(nn))

    def test_fractional_flow_mask_properties(self):
        rng = np.random.RandomState(1)
        flow = jnp.asarray(rng.randn(2, 8, 12, 2).astype(np.float32))
        nn = np.asarray(occlusion_mask_from_flow(flow, "nearest"))
        assert nn.min() >= 0.0 and nn.max() <= 1.0
        # zero flow -> full coverage
        z = np.asarray(
            occlusion_mask_from_flow(jnp.zeros((1, 6, 6, 2)), "nearest")
        )
        np.testing.assert_array_equal(z, np.ones_like(z))

    def test_converging_flow_marks_occlusion(self):
        # all pixels map to the center column: most targets get no mass
        h, w = 6, 8
        gx = np.arange(w, dtype=np.float32)
        fx = (w // 2 - gx)[None, None, :, None]
        flow = np.concatenate(
            [np.tile(fx, (1, h, 1, 1)), np.zeros((1, h, w, 1), np.float32)],
            axis=-1,
        )
        nn = np.asarray(occlusion_mask_from_flow(jnp.asarray(flow), "nearest"))
        assert nn[0, :, w // 2].min() == 1.0
        assert (nn == 0).sum() > 0

    def test_half_grid_mask_tracks_full_on_smooth_flow(self):
        # smooth (realistic) flows: the half-grid mask agrees with the
        # full-grid nearest mask away from boundaries
        h, w = 128, 128
        yy, xx = np.meshgrid(
            np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32),
            indexing="ij",
        )
        flow = jnp.asarray(
            np.stack([5.0 + 4.0 * xx / w, -3.0 + 2.0 * yy / h], -1)[None]
        )
        mh = np.asarray(occlusion_mask_from_flow(flow, "nearest_half"))
        mn = np.asarray(occlusion_mask_from_flow(flow, "nearest"))
        assert mh.shape == mn.shape
        assert (np.round(mh) == np.round(mn)).mean() > 0.9
        # small planes fall back to the full-grid splat (exact match)
        small = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 2), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(occlusion_mask_from_flow(small, "nearest_half")),
            np.asarray(occlusion_mask_from_flow(small, "nearest")),
        )
