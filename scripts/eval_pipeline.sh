#!/bin/bash
# End-to-end evaluation launcher (parity: slurm/eval_pipeline.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m text2pos_tpu.evaluation.pipeline "$@"
