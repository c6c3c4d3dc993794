#!/usr/bin/env bash
# Block-parallel ADMM training over the TPU mesh. Replaces the reference's
# torchrun master/worker launchers (train_admm_master.sh / train_admm_worker*.sh):
# on TPU the whole job is ONE SPMD process — no rendezvous, no RPC.
# Usage: scripts/train/train_admm.sh <scene> [overrides...]
set -euo pipefail
SCENE=${1:?scene}
shift 1
python preprocess_large_scale_data.py --config config/gaussian_splatting/urban3d_admm.yaml --scene "$SCENE"
python train.py --config config/gaussian_splatting/urban3d_admm.yaml --scene "$SCENE" "$@"
