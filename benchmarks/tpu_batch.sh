#!/bin/bash
# One-shot TPU measurement batch: run every armed benchmark/sweep in value
# order and save outputs under tpu_batch_out/.  Designed to be fired the
# moment the axon tunnel returns (possibly unattended), so the most
# important numbers land first if the tunnel flaps:
#   1. bench.py           -- the headline (self-tunes over armed candidates)
#   2. mosaic_probe       -- i16/i8/bf16 vector-op support retest (fast)
#   3. stream_sweep       -- fast4/full (bt, chunk) candidates
#   4. diag_sweep         -- banded diag kernel unroll
#   5. modes_bench        -- streamed vs plain semi-global/local engines
#   6. configs_bench      -- all 5 BASELINE configs artifact
#   7. verify_bench_shapes -- TPU-side oracle certification of bench shapes
#   8. scaling_bench      -- real-chip datapoint
#   9. soak               -- randomized cross-engine campaign
# Usage: benchmarks/tpu_batch.sh [out_dir]   (default tpu_batch_out)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-tpu_batch_out}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}"
# Do NOT export PYTHONPATH=repo-root here: it breaks axon PJRT plugin
# discovery in this image (backend 'axon' vanishes from the known list).
# Each benchmark script bootstraps sys.path itself instead.

run() { # run <budget_s> <name> <cmd...>
  local budget="$1" name="$2"; shift 2
  echo "=== $name ($(date -u +%FT%TZ), budget ${budget}s) ==="
  timeout "$budget" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "--- rc=$rc; stdout tail:"; tail -3 "$OUT/$name.out"
  return $rc
}

run 1200 bench        python bench.py
run  600 mosaic_probe python benchmarks/mosaic_probe.py
run 1800 stream_sweep python benchmarks/stream_sweep.py
run 1200 diag_sweep   python benchmarks/diag_sweep.py
run 1200 modes_bench  python benchmarks/modes_bench.py
run 1800 configs_bench python benchmarks/configs_bench.py
run 1800 verify_shapes python benchmarks/verify_bench_shapes.py
run 1200 scaling      python benchmarks/scaling_bench.py
run 2400 soak         python benchmarks/soak.py --rounds 2
echo "=== batch done $(date -u +%FT%TZ) ==="
