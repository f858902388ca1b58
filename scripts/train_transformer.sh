#!/bin/bash
# Transformer-matcher ablation launcher (parity: slurm/train_transformer.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m text2pos_tpu.train.transformer "$@"
