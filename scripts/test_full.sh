#!/usr/bin/env bash
# Full test lane: everything in tests/, including `heavy`-marked
# multi-minute trainer/ADMM/fusion tests (~35 min on the 8-device CPU
# mesh). The default `python -m pytest tests -q` is the fast lane (<10 min).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests -q -o addopts= "$@"
