#!/usr/bin/env bash
# Single-scene novel-view-synthesis training (reference scripts/train/train_nvs.sh).
# Usage: scripts/train/train_nvs.sh <dataset> <scene> [extra dotlist overrides...]
set -euo pipefail
DATASET=${1:?dataset (e.g. mipnerf360)}
SCENE=${2:?scene}
shift 2
python train.py --config "config/gaussian_splatting/${DATASET}.yaml" --scene "$SCENE" "$@"
