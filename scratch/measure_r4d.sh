#!/bin/bash
# Round-4 queue part D: measure the border-assembly change (concat frame
# instead of dynamic_update_slice — the #1 residual HBM group from the
# part-C profile), and the Winograd re-check on the drifted libtpu
# (VERDICT r3 #8).
set -u
cd "$(dirname "$0")/.."
LOG=scratch/measure_r4.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
exec >> "$LOG" 2>&1

echo "=== $(date -u +%FT%TZ) round-4 queue part D start ==="

echo "--- bench: border-assembly conv_up_fold (concat frame) ---"
timeout 1800 python -u bench.py

echo "--- winograd re-check on current libtpu ---"
timeout 1800 python -u scratch/wino_bench.py

echo "=== $(date -u +%FT%TZ) round-4 queue part D done ==="
