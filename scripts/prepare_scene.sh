#!/bin/bash
# Data preparation launcher (parity: slurm wrappers around datapreparation).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m text2pos_tpu.data.prepare "$@"
