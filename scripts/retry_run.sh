#!/bin/bash
# Retry a pings_tpu CLI run until it finishes without losing track.
# TPU-native counterpart of the reference robustness-by-retry wrapper
# (reference retry_pings.sh:16-44): the SLAM front-end aborts with
# "lose track for a long time" after N consecutive failed registrations
# (pings_tpu/slam/pipeline.py lose_track_abort_n); some sequences need a
# few attempts (different seeds) to get through a degenerate stretch.
#
# Usage: scripts/retry_run.sh [max_attempts] -- <cli args...>
# Example:
#   scripts/retry_run.sh 10 -- configs/run_synthetic.yaml --tag retry_demo

set -u
MAX_ATTEMPTS=10
if [[ "${1:-}" =~ ^[0-9]+$ ]]; then
  MAX_ATTEMPTS=$1; shift
fi
[[ "${1:-}" == "--" ]] && shift
if [[ $# -eq 0 ]]; then
  echo "usage: $0 [max_attempts] -- <pings_tpu.cli args...>" >&2
  exit 2
fi

FAIL_PATTERN="lose track for a long time"
for ((attempt=1; attempt<=MAX_ATTEMPTS; attempt++)); do
  echo "[retry_run] attempt ${attempt}/${MAX_ATTEMPTS}: python -m pings_tpu.cli $*"
  OUTPUT=$(python -m pings_tpu.cli "$@" --seed "$attempt" 2>&1)
  CODE=$?
  if [[ $CODE -eq 0 ]] && ! grep -qi "$FAIL_PATTERN" <<<"$OUTPUT"; then
    echo "$OUTPUT" | tail -20
    echo "[retry_run] success after ${attempt} attempt(s)"
    exit 0
  fi
  echo "$OUTPUT" | tail -5
  echo "[retry_run] attempt ${attempt} failed (exit ${CODE}); retrying..."
  sleep 2
done
echo "[retry_run] giving up after ${MAX_ATTEMPTS} attempts" >&2
exit 1
