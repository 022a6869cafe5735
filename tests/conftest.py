"""Test config: run every test on a virtual 8-device CPU platform.

This is the standard JAX substitute for a multi-chip fixture (SURVEY.md §4):
``xla_force_host_platform_device_count=8`` gives 8 independent XLA CPU
devices so mesh/sharding/collective code paths are exercised for real.
Must run before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax at interpreter start and pins
# jax_platforms to the TPU plugin; the config update wins over the env var
# as long as no backend has been initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)
