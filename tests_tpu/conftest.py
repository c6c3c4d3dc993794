"""Real-TPU test lane (VERDICT r2 item 7).

The main suite (tests/) pins itself to a virtual CPU mesh so it runs
anywhere; the Pallas kernels there execute in interpret mode only. THIS
lane runs the production kernels on an actual TPU chip and is skipped
entirely when none is attached.

Run with:  python -m pytest tests_tpu -q
(kept outside tests/ because tests/conftest.py forces the CPU backend at
import time for the whole tree under it).
"""

import pytest


def pytest_collection_modifyitems(config, items):
    import jax

    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend init failure == no TPU
        on_tpu = False
    if on_tpu:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        return
    skip = pytest.mark.skip(reason="no TPU attached")
    for item in items:
        item.add_marker(skip)
