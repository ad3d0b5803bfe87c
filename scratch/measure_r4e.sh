#!/bin/bash
# Round-4 queue part E: serving batch+VMEM re-sweep (rerun to completion;
# the first attempt died at b160 when the session restarted), then the
# demo/four_recipes regeneration on TPU at 512².
set -u
cd "$(dirname "$0")/.."
LOG=scratch/measure_r4.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
exec >> "$LOG" 2>&1
echo "=== $(date -u +%FT%TZ) round-4 queue part E start ==="
echo "--- serving batch + vmem re-sweep (post-fold, full rerun) ---"
timeout 2400 python -u scratch/serving_sweep_r4.py
echo "--- demo/four_recipes regeneration on TPU at 512^2 ---"
timeout 5400 python -u scratch/demo_four_recipes.py /tmp/demo_r4
echo "=== $(date -u +%FT%TZ) round-4 queue part E done ==="
