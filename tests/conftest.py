"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests must not depend on TPU hardware: we force the CPU backend with 8
virtual devices so distributed (mesh/ADMM) paths are exercised single-host,
per SURVEY.md §4 tier 5.  Must run before jax initializes its backends.

NOTE: this environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel) and the
env var wins over os.environ mutation at import time, so the override goes
through jax.config instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# DOGS_TPU_TESTS=1 opts into the real-hardware lane (tests/tpu/): keep the
# TPU backend and production numerics. Everything else runs on the virtual
# CPU mesh.
_TPU_LANE = os.environ.get("DOGS_TPU_TESTS") == "1"
if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    # Test assertions do exact-ish f32 comparisons; don't let test-side
    # matmuls silently run at bf16 precision.
    jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()} devices: {jax.device_count()}"
