#!/bin/bash
# Offset-regressor study launcher (parity: slurm/train_offsets.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m text2pos_tpu.train.offsets "$@"
