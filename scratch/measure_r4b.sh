#!/bin/bash
# Round-4 measurement queue, part B — the legs that hadn't finished when
# the first queue died mid-fp8-conv-probe (scratch/measure_r4.log ends at
# the dec1 fp8_e4m3 line, 14:31Z). Already-complete legs (bench with
# per-mode folds, ceilings re-baseline) are NOT repeated.
set -u
cd "$(dirname "$0")/.."
LOG=scratch/measure_r4.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
exec >> "$LOG" 2>&1

echo "=== $(date -u +%FT%TZ) round-4 queue part B start ==="

echo "--- direct fp8 conv probe (rerun to completion) ---"
timeout 1800 python -u scratch/fp8_conv_probe.py

echo "--- bench: both folds OFF (completes r3 isolation matrix) ---"
UNET_TPU_DENSE_UP_FOLD=0 UNET_TPU_S2D_UP_FOLD=0 timeout 1800 python -u bench.py

echo "--- post-fold HLO profile (compile-only) ---"
timeout 1800 python -u scratch/post_fold_profile.py

echo "--- train batch sweep ---"
timeout 3600 python -u scratch/batch_sweep.py

echo "=== $(date -u +%FT%TZ) round-4 queue part B done ==="
