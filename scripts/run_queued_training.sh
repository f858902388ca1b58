#!/bin/bash
# Outage-resilient driver for the queued bench-checkpoint training run.
#
# The remote-attached TPU relay has dropped mid-run twice; this wrapper
# (a) waits until the relay answers, (b) runs scripts/train_bench_ckpts.py
# with --resume so progress survives kills, and (c) retries after failures,
# resuming from the rolling checkpoint each time.
#
# Usage: bash scripts/run_queued_training.sh [train_bench_ckpts.py args...]
# The default args reproduce the round-3 queued experiment
# (docs/STATUS.md "Queued experiment"): 48 scenes, neg-bank, 96 epochs.
set -u
cd "$(dirname "$0")/.."

ARGS=("$@")
if [ ${#ARGS[@]} -eq 0 ]; then
  ARGS=(--skip_pointnet --epochs 96 --fine_epochs 12 --train_scenes 48
        --neg_bank --eval_every 12 --coarse_gamma 0.95
        --out_dir checkpoints_r4)
fi

MAX_ATTEMPTS=${MAX_ATTEMPTS:-12}
for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  # Wait for the TPU relay (PJRT client creation hangs when it is down,
  # so probe with a hard timeout).
  until timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "$(date -u +%H:%M:%S) TPU relay down, waiting..." >&2
    sleep 120
  done
  echo "$(date -u +%H:%M:%S) attempt $attempt: starting training" >&2
  T2P_BENCH_INIT_TIMEOUT=${T2P_BENCH_INIT_TIMEOUT:-600} \
  T2P_FUSED_VERBOSE=${T2P_FUSED_VERBOSE:-1} \
  T2P_FUSED_SEG=${T2P_FUSED_SEG:-128} \
    python scripts/train_bench_ckpts.py --resume "${ARGS[@]}" &
  TPID=$!
  # CPU-flatline watchdog: a relay drop mid-run leaves the process
  # blocked in a device RPC at ~0% CPU *forever* (observed round 5:
  # 17 min flat before a manual kill), which the exit-code retry above
  # can never see. Even the slowest remote compiles keep finishing
  # within ~15 min, so 20 min (< 100 jiffies ≈ 1 s of CPU) is a hang.
  last_cpu=0
  last_t=$(date +%s)
  while kill -0 "$TPID" 2>/dev/null; do
    sleep 60
    cpu=$(awk '{print $14+$15}' "/proc/$TPID/stat" 2>/dev/null) || continue
    now=$(date +%s)
    if [ $((now - last_t)) -ge "${HANG_WINDOW:-1200}" ]; then
      if [ -n "$cpu" ] && [ $((cpu - last_cpu)) -lt 100 ]; then
        echo "$(date -u +%H:%M:%S) watchdog: CPU flat for ${HANG_WINDOW:-1200}s, killing $TPID" >&2
        kill "$TPID"
      fi
      last_cpu=${cpu:-$last_cpu}
      last_t=$now
    fi
  done
  wait "$TPID" && exit 0
  echo "$(date -u +%H:%M:%S) attempt $attempt failed (rc=$?); will resume" >&2
  sleep 60
done
echo "giving up after $MAX_ATTEMPTS attempts" >&2
exit 1
