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
