"""Test configuration: force CPU with 8 virtual devices for mesh tests.

The environment's axon site customization pins JAX_PLATFORMS=axon (the
tunneled TPU), so the env var alone is not enough -- we must override the
config after import, before any backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the joint-model graphs are large; caching
# makes repeat test runs fast.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() >= 8, jax.devices()


# Tier markers by module (measured on the 1-core verification host,
# PERF.md round-4 notes). `pytest -m quick` is the ~2-minute pre-commit
# gate; the other tiers re-trace big graphs (model), run the torch oracle
# (parity), interpret Pallas kernels (kernels), or train (e2e).
_TIERS = {
    "test_data": "quick",
    "test_evaluation": "quick",
    "test_prep": "quick",
    "test_eval_tasks": "quick",
    "test_triangulation_pose": "quick",
    "test_flowpose_model": "quick",
    "test_estimators": "quick",
    "test_splat": "quick",
    "test_int8_conv": "quick",
    "test_models": "model",
    "test_loss_scale": "model",
    "test_staging": "model",
    "test_packed_conv": "model",
    "test_parity_golden": "parity",
    "test_parity_flow": "parity",
    "test_ops_golden": "parity",
    "test_pallas_kernels": "kernels",
    "test_warp_window": "kernels",
    "test_splat_window": "kernels",
    "test_train_e2e": "e2e",
    "test_learning": "e2e",
    "test_train_step": "e2e",
}


_TIER_NAMES = {"quick", "model", "parity", "kernels", "e2e"}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        # an explicit tier marker on a test/class overrides the module tier
        # (e.g. a heavy integration test inside a quick-tier module)
        if any(m.name in _TIER_NAMES for m in item.iter_markers()):
            continue
        tier = _TIERS.get(item.module.__name__)
        if tier is not None:
            item.add_marker(getattr(pytest.mark, tier))
