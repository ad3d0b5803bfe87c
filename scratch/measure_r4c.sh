#!/bin/bash
# Round-4 measurement queue, part C: the two part-B legs that failed on a
# missing sys.path insert (now fixed), plus the fp8 end-to-end probe that
# the direct-conv results (part B) justified building.
set -u
cd "$(dirname "$0")/.."
LOG=scratch/measure_r4.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
exec >> "$LOG" 2>&1

echo "=== $(date -u +%FT%TZ) round-4 queue part C start ==="

echo "--- fp8 end-to-end inference probe ---"
timeout 3600 python -u scratch/fp8_e2e_probe.py

echo "--- post-fold HLO profile (compile-only) ---"
timeout 1800 python -u scratch/post_fold_profile.py

echo "--- train batch sweep ---"
timeout 3600 python -u scratch/batch_sweep.py

echo "=== $(date -u +%FT%TZ) round-4 queue part C done ==="
