#!/usr/bin/env bash
# Block-parallel ADMM training over the TPU mesh. Replaces the reference's
# torchrun master/worker launchers (train_admm_master.sh / train_admm_worker*.sh):
# on TPU the whole job is ONE SPMD process — no rendezvous, no RPC. The
# master lifecycle (phase-1 -> fusion + post-merge prune -> ADMM consensus)
# runs inside train_admm.py.
#
# Usage: scripts/train/train_admm.sh <scene> [overrides...]
#   scripts/train/train_admm.sh rubble                          # urban3d
#   scripts/train/train_admm.sh toy_blocks --smoke              # data-free smoke
#   Resume after interruption: add trainer.resume=true
set -euo pipefail
SCENE=${1:?scene}
shift 1

CONFIG=config/gaussian_splatting/urban3d_admm.yaml
if [[ "${1:-}" == "--smoke" ]]; then
  CONFIG=config/gaussian_splatting/synthetic_admm_smoke.yaml
  shift 1
fi

python preprocess_large_scale_data.py --config "$CONFIG" --scene "$SCENE"
python train_admm.py --config "$CONFIG" --scene "$SCENE" "$@"
