"""Test configuration: 8 virtual CPU devices, float64 enabled.

Tests run on CPU (fast, deterministic, f64-capable) with a faked 8-device
mesh so multi-chip sharding logic is exercised without hardware, per the
strategy in SURVEY.md §4.
"""

import os

# Force CPU. The image's sitecustomize (PYTHONPATH=/root/.axon_site)
# pre-imports jax in every process and registers the remote-TPU "axon"
# backend with JAX_PLATFORMS=axon already snapshotted into jax's config —
# mutating os.environ here is too late and the whole suite silently runs
# over the TPU tunnel (compiles included). jax.config.update is the only
# reliable override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound on small hosts;
# re-runs hit disk instead of re-invoking XLA.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
