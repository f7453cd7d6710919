"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on host CPU devices (the TPU analog
of a fake backend — JAX collectives are semantically identical over mocked
meshes). Note: on this machine the axon TPU plugin ignores the JAX_PLATFORMS
env var, so we must force the platform through jax.config BEFORE any backend
is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the heavyweight jitted programs (chunk scan,
# multi-octave detection) dominate suite wall time on their first compile;
# caching them makes re-runs hit the <3 min default-tier target
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
