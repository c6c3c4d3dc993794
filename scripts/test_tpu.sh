#!/usr/bin/env bash
# Real-TPU test lane: compiled Pallas kernel parity + bin-budget safety.
# Requires an attached TPU (jax.default_backend() == "tpu"); every test
# skips otherwise. Keep this the ONLY process using the TPU while it runs.
set -euo pipefail
cd "$(dirname "$0")/.."
DOGS_TPU_TESTS=1 exec python -m pytest tests/tpu -q "$@"
