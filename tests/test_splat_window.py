"""Windowed Pallas forward-splat vs the XLA scatter-add form (interpret mode).

Mass parity against ops/splat.py's forward_splat(ones, flow) -- the tent
reformulation must reproduce the 4-tap bilinear scatter exactly (f32
accumulation order aside), including out-of-frame drops and band-crossing
targets. Hardware compile/perf is covered by scripts/bench_splat_window.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas.splat_window import (
    splat_mass_window,
)
from unsupervised_depth_opticalflow_egomotion_tpu.ops.splat import (
    forward_splat,
    occlusion_mask_from_flow,
)


def _mk(b=2, h=64, w=160, flow_scale=5.0, dy=0.0, dx=0.0, seed=0):
    rng = np.random.RandomState(seed)
    f = rng.uniform(-flow_scale, flow_scale, (b, h, w, 2)).astype(np.float32)
    f[..., 0] += dx
    f[..., 1] += dy
    return jnp.asarray(f)


def _ref_mass(flow):
    b, h, w, _ = flow.shape
    ones = jnp.ones((b, h, w, 1), jnp.float32)
    return forward_splat(ones, flow)


def _check(flow, atol=2e-5):
    out = splat_mass_window(flow, interpret=True)
    ref = _ref_mass(flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)


class TestMassParity:
    def test_small_flow(self):
        _check(_mk())

    def test_zero_flow_all_ones(self):
        out = splat_mass_window(_mk(flow_scale=0.0), interpret=True)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)

    def test_large_uniform_vertical_tracked_by_window(self):
        # +-40-row uniform shift: far beyond one band, absorbed by the
        # per-band window starts
        _check(_mk(dy=40.0))
        _check(_mk(dy=-40.0))

    def test_large_horizontal_inside_coverage(self):
        # +-100 px is inside the ncol=1 (+-128 px) column coverage
        _check(_mk(w=384, dx=100.0))
        _check(_mk(w=384, dx=-100.0))

    def test_out_of_frame_drops_all_mass(self):
        out = splat_mass_window(_mk(dy=500.0), interpret=True)
        assert float(jnp.max(jnp.abs(out))) == 0.0

    def test_boundary_targets(self):
        # targets straddling the frame edges: partial taps drop exactly
        # like the scatter form's in-bounds masking
        flow = _mk(flow_scale=2.0)
        flow = flow.at[:, :4, :, 1].add(-3.5)
        flow = flow.at[:, -4:, :, 1].add(3.5)
        flow = flow.at[:, :, :4, 0].add(-3.5)
        flow = flow.at[:, :, -4:, 0].add(3.5)
        _check(flow)

    def test_band_crossing_targets(self):
        # targets exactly on 32-row band boundaries: each integer tap row
        # belongs to exactly one band (no double count, no gap)
        b, h, w = 1, 64, 160
        flow = jnp.zeros((b, h, w, 2), jnp.float32)
        flow = flow.at[..., 1].set(31.5 - jnp.arange(h, dtype=jnp.float32)[None, :, None])
        _check(flow)

    def test_integer_targets_exact(self):
        flow = jnp.round(_mk(flow_scale=7.0))
        out = splat_mass_window(flow, interpret=True)
        ref = _ref_mass(flow)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_non_multiple_width(self):
        _check(_mk(w=208))  # pads 208 -> 256 lanes

    def test_bf16_flow_input(self):
        flow = _mk().astype(jnp.bfloat16)
        out = splat_mass_window(flow, interpret=True)
        ref = _ref_mass(flow.astype(jnp.float32))
        # coordinate math runs in f32 either way; bf16 flow loses input
        # precision identically in both paths
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestGuards:
    def test_dropped_counter_fires_on_extreme_vertical_variation(self):
        # alternate +60/-60 px vertical flow within the same rows: the
        # contributing span for a band exceeds win=64 -> dropped rows
        b, h, w = 1, 128, 160
        fy = np.zeros((b, h, w), np.float32)
        fy[:, ::2] = 60.0
        fy[:, 1::2] = -60.0
        flow = jnp.asarray(np.stack([np.zeros_like(fy), fy], axis=-1))
        out, dropped = splat_mass_window(
            flow, win=64, interpret=True, with_stats=True
        )
        assert int(np.asarray(dropped).max()) > 0

    def test_dropped_zero_on_smooth_flow(self):
        _, dropped = splat_mass_window(
            _mk(flow_scale=5.0, dy=20.0), interpret=True, with_stats=True
        )
        assert int(np.asarray(dropped).max()) == 0

    def test_no_gradient_flows(self):
        flow = _mk()

        def loss(f):
            return jnp.sum(splat_mass_window(f, interpret=True))

        g = jax.grad(loss)(flow)
        assert float(jnp.max(jnp.abs(g))) == 0.0

    def test_unsupported_width_raises(self):
        with pytest.raises(ValueError):
            splat_mass_window(_mk(w=96), interpret=True)


class TestOcclusionIntegration:
    def test_bilinear_taps_use_kernel_when_forced(self):
        from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas import (
            splat_window,
        )

        flow = _mk(seed=7)
        ref = occlusion_mask_from_flow(flow, "bilinear_xla")
        splat_window._FORCE_INTERPRET = True
        try:
            out = occlusion_mask_from_flow(flow, "bilinear")
        finally:
            splat_window._FORCE_INTERPRET = False
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_small_plane_falls_back_to_scatter(self):
        # w < 128: wrapper must keep the XLA scatter path (no kernel call)
        flow = _mk(h=32, w=64)
        out = occlusion_mask_from_flow(flow, "bilinear")
        ref = occlusion_mask_from_flow(flow, "bilinear_xla")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestGuardedFallback:
    """splat_mass_window_guarded: exact XLA scatter whenever the kernel's
    displacement window would drop mass (VERDICT r4 weak #4 guard)."""

    def _guarded(self, flow, **kw):
        from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas.splat_window import (
            splat_mass_window_guarded,
        )

        return splat_mass_window_guarded(flow, interpret=True, **kw)

    def test_violations_zero_on_smooth_flow(self):
        from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas.splat_window import (
            splat_coverage_violations,
        )

        assert int(splat_coverage_violations(_mk(flow_scale=5.0, dy=20.0))) == 0

    def test_violations_fire_on_200px_horizontal(self):
        from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas.splat_window import (
            splat_coverage_violations,
        )

        # 200 px in-frame horizontal movers exceed the ncol=1 (+-128 px
        # block) coverage -- the KITTI-2015 fast-mover scale
        flow = _mk(b=1, h=64, w=512, flow_scale=1.0)
        flow = flow.at[:, :, :128, 0].add(200.0)
        assert int(splat_coverage_violations(flow)) > 0

    def test_violations_fire_on_extreme_vertical_variation(self):
        from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas.splat_window import (
            splat_coverage_violations,
        )

        fy = np.zeros((1, 128, 160), np.float32)
        fy[:, ::2] = 60.0
        fy[:, 1::2] = -60.0
        flow = jnp.asarray(np.stack([np.zeros_like(fy), fy], axis=-1))
        assert int(splat_coverage_violations(flow, win=64)) > 0

    def test_guarded_exact_on_200px_flow(self):
        # the guard must route extreme flows to the exact scatter: parity
        # is EXACT (same op), not approximate
        flow = _mk(b=1, h=64, w=512, flow_scale=1.0)
        flow = flow.at[:, :, :128, 0].add(200.0)
        out, viol = self._guarded(flow, with_stats=True)
        assert int(viol) > 0
        ref = _ref_mass(flow)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_guarded_keeps_kernel_on_smooth_flow(self):
        flow = _mk(flow_scale=5.0, dy=20.0)
        out, viol = self._guarded(flow, with_stats=True)
        assert int(viol) == 0
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_ref_mass(flow)), atol=2e-5
        )

    def test_occlusion_wrapper_guards(self):
        # end-to-end through occlusion_mask_from_flow: extreme flow must
        # produce the exact-scatter mask, not a mass-dropped one
        from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas import (
            splat_window,
        )

        flow = _mk(b=1, h=64, w=512, flow_scale=1.0)
        flow = flow.at[:, :, :128, 0].add(200.0)
        ref = occlusion_mask_from_flow(flow, "bilinear_xla")
        splat_window._FORCE_INTERPRET = True
        try:
            out = occlusion_mask_from_flow(flow, "bilinear")
        finally:
            splat_window._FORCE_INTERPRET = False
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
