"""Test configuration: CPU backend with a faked 8-device mesh.

The reference tests on a single Metal device; here the test-time analog of
"no TPU hardware required" is the CPU backend with
``--xla_force_host_platform_device_count=8`` so sharding / ring-attention
tests exercise real mesh code paths (SURVEY.md §4).  Pallas kernels run in
interpreter mode on CPU (auto-detected by the ops layer).
"""

import os

# Must be set before jax initializes its backends.  The environment's TPU
# plugin force-registers itself via sitecustomize (JAX_PLATFORMS=axon), so
# the env var alone is not enough — the config is re-forced to cpu below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect an 8-device virtual mesh"

import pytest  # noqa: E402


@pytest.fixture
def rng_key():
    # Seed 42 mirrors the reference's mt19937(42) fixture (main.mm:25).
    return jax.random.PRNGKey(42)
