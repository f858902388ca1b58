#!/bin/bash
# TPU job launcher for coarse retrieval training
# (role parity with reference slurm/train_coarse.sh — single-host job wrapper).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m text2pos_tpu.train.coarse --batch_size 64 --learning_rate 1e-3 \
    --embed_dim 256 "$@"
