#!/bin/bash
# Probe the axon TPU tunnel in a loop; the moment a probe succeeds, fire
# the one-shot measurement batch (benchmarks/tpu_batch.sh).  Safe to leave
# running unattended for a whole session.
#   Usage: benchmarks/tpu_watch.sh [out_dir] [probe_timeout_s] [sleep_s]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-tpu_batch_out}"
PROBE_T="${2:-75}"
SLEEP_S="${3:-120}"
PROBE='import jax; jax.devices(); import sys; sys.stdout.write(jax.default_backend())'

while true; do
  echo "[tpu_watch] probe $(date -u +%FT%TZ)"
  backend=$(timeout "$PROBE_T" python -c "$PROBE" 2>/dev/null)
  rc=$?
  if [ $rc -eq 0 ] && [ "$backend" = "tpu" ]; then
    echo "[tpu_watch] TPU UP at $(date -u +%FT%TZ) -- firing batch"
    bash benchmarks/tpu_batch.sh "$OUT"
    echo "[tpu_watch] batch finished rc=$? at $(date -u +%FT%TZ)"
    exit 0
  fi
  echo "[tpu_watch] down (rc=$rc backend='${backend:-}'), sleeping ${SLEEP_S}s"
  sleep "$SLEEP_S"
done
