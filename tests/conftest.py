"""Test env: force CPU with 8 virtual devices so sharding tests run without
TPU hardware (SURVEY.md §4's answer to 'multi-node without a cluster')."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
import jax  # noqa: E402

# The environment's TPU plugin overrides the JAX_PLATFORMS env var, so force
# the CPU backend through the config API (before any backend initialization).
jax.config.update("jax_platforms", "cpu")
# persistent compile cache (env-var spelling is ignored by this jax version)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from thinktwice_tpu.config import Config, SimConfig  # noqa: E402
from thinktwice_tpu.maps.procedural import make_grid_town  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg() -> Config:
    """Small capacities so tests trace fast."""
    return Config(
        sim=SimConfig(
            max_vehicles=16,
            max_walkers=8,
            max_lights=64,
            max_stop_signs=8,
            max_route_len=256,
            max_scenarios=8,
        )
    )


@pytest.fixture(scope="session")
def town():
    return make_grid_town(n_blocks=2, block=100.0)


@pytest.fixture(scope="session")
def eight_devices():
    assert jax.device_count() >= 8, jax.devices()
    return jax.devices()[:8]
