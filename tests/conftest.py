"""Test configuration: run everything on CPU with 8 virtual XLA devices so
multi-chip sharding paths are exercised without TPU hardware."""
import os

# Force override: the ambient environment pins JAX to the TPU tunnel (and
# something in the image re-pins JAX_PLATFORMS), so unit tests must override
# via jax.config to run hermetically on the host CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_cache_growth():
    """Drop JAX's in-process compile caches after each test module.

    The full suite compiles hundreds of distinct XLA programs; keeping every
    executable alive for the whole run has crashed the CPU XLA client late in
    the suite (SIGSEGV during a compile after ~90% of files had run). Modules
    don't share jitted functions, so per-module clearing costs nothing and
    bounds accumulation in any invocation mode (plain or pytest-xdist).
    """
    yield
    jax.clear_caches()
