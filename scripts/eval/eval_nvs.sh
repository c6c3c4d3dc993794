#!/usr/bin/env bash
# Evaluate a trained scene (reference scripts/eval/eval_nvs.sh).
set -euo pipefail
DATASET=${1:?dataset}
SCENE=${2:?scene}
shift 2
python eval.py --config "config/gaussian_splatting/${DATASET}.yaml" --scene "$SCENE" "$@"
