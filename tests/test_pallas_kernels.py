"""Pallas kernel correctness vs the XLA reference formulation (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from unsupervised_depth_opticalflow_egomotion_tpu.ops.cost_volume import correlation
from unsupervised_depth_opticalflow_egomotion_tpu.ops.pallas.correlation import (
    correlation_pallas,
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
