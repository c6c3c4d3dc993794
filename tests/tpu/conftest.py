"""Real-TPU test lane (VERDICT r2 item 7).

The main suite runs interpret-mode Pallas on a virtual CPU mesh; nothing
there exercises the compiled TPU kernels. This lane does. It only runs when
a TPU is actually attached AND the caller opted in:

    DOGS_TPU_TESTS=1 python -m pytest tests/tpu -q

(scripts/test_tpu.sh wraps that one command.) Without the env var the parent
conftest pins jax to CPU and every test here skips.
"""

import os

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    # NB: this hook sees the WHOLE session's items (pytest loads nested
    # conftest hooks globally), so scope the skip to tests/tpu/ only —
    # otherwise collecting tests/ would skip the entire main suite.
    if os.environ.get("DOGS_TPU_TESTS") != "1" or jax.default_backend() != "tpu":
        here = os.path.dirname(os.path.abspath(__file__))
        skip = pytest.mark.skip(
            reason="real-TPU lane: set DOGS_TPU_TESTS=1 with a TPU attached"
        )
        for item in items:
            if str(item.fspath).startswith(here):
                item.add_marker(skip)


@pytest.fixture(scope="session", autouse=True)
def _compile_cache():
    # First compiles through the remote-TPU tunnel are minutes; persist them.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
