#!/bin/bash
# TPU job launcher for fine matcher training (parity: slurm/train_fine.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m text2pos_tpu.train.fine --batch_size 32 --learning_rate 3e-4 \
    --embed_dim 128 "$@"
