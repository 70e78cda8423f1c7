"""Pallas kernel correctness vs the XLA reference formulation (interpret mode on CPU).

Hardware validation lives in scripts/bench_corr.py (run on v5e: matches on
every level shape that fits VMEM; per-level ms recorded in PERF.md).
"""

import jax
import numpy as np
import jax.numpy as jnp

from unsupervised_depth_opticalflow_egomotion_tpu.ops.cost_volume import correlation
from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas.correlation import (
    correlation_pallas,
    correlation_vjp,
    pallas_fits,
)


class TestCorrelationPallas:
    def test_matches_xla_formulation(self):
        rng = np.random.RandomState(0)
        f1 = jnp.asarray(rng.rand(2, 6, 10, 8).astype(np.float32))
        f2 = jnp.asarray(rng.rand(2, 6, 10, 8).astype(np.float32))
        want = np.asarray(correlation(f1, f2, md=2))
        got = np.asarray(correlation_pallas(f1, f2, md=2, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_md4_shape(self):
        rng = np.random.RandomState(1)
        f1 = jnp.asarray(rng.rand(1, 8, 13, 4).astype(np.float32))
        f2 = jnp.asarray(rng.rand(1, 8, 13, 4).astype(np.float32))
        got = np.asarray(correlation_pallas(f1, f2, md=4, interpret=True))
        assert got.shape == (1, 8, 13, 81)
        want = np.asarray(correlation(f1, f2, md=4))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_vjp_matches_xla_grad(self):
        """The custom backward (correlation_vjp) equals AD through the XLA
        form -- required before corr_impl='pallas' is usable in training."""
        rng = np.random.RandomState(2)
        f1 = jnp.asarray(rng.rand(2, 6, 10, 8).astype(np.float32))
        f2 = jnp.asarray(rng.rand(2, 6, 10, 8).astype(np.float32))
        cot = jnp.asarray(rng.rand(2, 6, 10, 81).astype(np.float32))

        def loss_ref(a, b):
            return jnp.sum(correlation(a, b, md=4) * cot)

        # the VMEM-bound fallback makes correlation_vjp use the XLA forward
        # here; the custom backward still runs, which is what's under test
        def loss_vjp(a, b):
            return jnp.sum(correlation_vjp(a, b, 4) * cot)

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
        g_vjp = jax.grad(loss_vjp, argnums=(0, 1))(f1, f2)
        for a, b in zip(g_ref, g_vjp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_vmem_bound(self):
        assert pallas_fits((16, 16, 52, 96))
        assert not pallas_fits((16, 64, 208, 32))


class TestCorrelationFused:
    """Round-3 channel-major fused fwd+bwd kernels (correlation_fused.py)."""

    def _with_interpret(self):
        from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas import (
            correlation_fused as cf,
        )

        return cf

    def test_fwd_matches_xla(self):
        cf = self._with_interpret()
        rng = np.random.RandomState(0)
        f1 = jnp.asarray(rng.randn(2, 8, 16, 12).astype(np.float32))
        f2 = jnp.asarray(rng.randn(2, 8, 16, 12).astype(np.float32))
        want = np.asarray(correlation(f1, f2, md=4))
        old = cf._FORCE_INTERPRET
        cf._FORCE_INTERPRET = True
        try:
            got = np.asarray(cf.correlation_fused(f1, f2, 4))
        finally:
            cf._FORCE_INTERPRET = old
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_bwd_matches_xla_grad(self):
        cf = self._with_interpret()
        rng = np.random.RandomState(1)
        f1 = jnp.asarray(rng.randn(1, 10, 14, 7).astype(np.float32))
        f2 = jnp.asarray(rng.randn(1, 10, 14, 7).astype(np.float32))
        cot = jnp.asarray(rng.randn(1, 10, 14, 81).astype(np.float32))

        def loss_ref(a, b):
            return jnp.sum(correlation(a, b, md=4) * cot)

        d1r, d2r = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
        old = cf._FORCE_INTERPRET
        cf._FORCE_INTERPRET = True
        try:
            def loss_new(a, b):
                return jnp.sum(cf.correlation_fused(a, b, 4) * cot)

            d1n, d2n = jax.grad(loss_new, argnums=(0, 1))(f1, f2)
        finally:
            cf._FORCE_INTERPRET = old
        np.testing.assert_allclose(np.asarray(d1n), np.asarray(d1r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2n), np.asarray(d2r), atol=1e-4)

    def test_cpu_fallback_is_xla(self):
        """Off-TPU without forced interpret, the public entry must equal the
        XLA formulation exactly (it IS the XLA formulation)."""
        cf = self._with_interpret()
        rng = np.random.RandomState(2)
        f1 = jnp.asarray(rng.randn(1, 6, 9, 5).astype(np.float32))
        f2 = jnp.asarray(rng.randn(1, 6, 9, 5).astype(np.float32))
        got = np.asarray(cf.correlation_fused(f1, f2, 4))
        want = np.asarray(correlation(f1, f2, md=4))
        np.testing.assert_allclose(got, want, atol=0)


class TestSSIMFused:
    """Round-3 fused SSIM map kernel (ops/pallas/ssim_fused.py)."""

    def _mod(self):
        from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas import (
            ssim_fused as sf,
        )

        return sf

    def test_fwd_matches_xla(self):
        from unsupervised_depth_opticalflow_egomotion_tpu.ops.ssim import ssim_xla

        sf = self._mod()
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(2, 40, 64, 3).astype(np.float32))
        y = jnp.asarray(rng.rand(2, 40, 64, 3).astype(np.float32))
        old = sf._FORCE_INTERPRET
        sf._FORCE_INTERPRET = True
        try:
            got = np.asarray(sf.ssim_fused(x, y))
        finally:
            sf._FORCE_INTERPRET = old
        np.testing.assert_allclose(got, np.asarray(ssim_xla(x, y)), atol=2e-5)

    def test_bwd_matches_xla_grad(self):
        from unsupervised_depth_opticalflow_egomotion_tpu.ops.ssim import ssim_xla

        sf = self._mod()
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 36, 48, 3).astype(np.float32))
        y = jnp.asarray(rng.rand(1, 36, 48, 3).astype(np.float32))
        cot = jnp.asarray(rng.randn(1, 36, 48, 3).astype(np.float32))
        dxw, dyw = jax.vjp(ssim_xla, x, y)[1](cot)
        old = sf._FORCE_INTERPRET
        sf._FORCE_INTERPRET = True
        try:
            dxg, dyg = jax.vjp(sf.ssim_fused, x, y)[1](cot)
        finally:
            sf._FORCE_INTERPRET = old
        np.testing.assert_allclose(np.asarray(dxg), np.asarray(dxw), atol=2e-5)
        np.testing.assert_allclose(np.asarray(dyg), np.asarray(dyw), atol=2e-5)

    def test_cpu_fallback_is_xla(self):
        from unsupervised_depth_opticalflow_egomotion_tpu.ops.ssim import (
            ssim,
            ssim_xla,
        )

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(1, 33, 40, 3).astype(np.float32))
        y = jnp.asarray(rng.rand(1, 33, 40, 3).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(ssim(x, y)), np.asarray(ssim_xla(x, y)), atol=0
        )
