#!/bin/bash
# TPU job launcher for PointNet++ pretraining (parity: slurm/train_pn.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m text2pos_tpu.train.pointnet2 "$@"
