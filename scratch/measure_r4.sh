#!/bin/bash
# Round-4 measurement queue (VERDICT round-3 #1-#4). Serial — one host CPU
# core. Ordered by decision value so a tunnel outage loses the least:
#   1. bench.py with the NEW per-mode fold defaults (headline numbers:
#      expect ~641 infer / ~169 train from the round-3 isolation legs)
#   2. ceilings re-baseline (fast; every SoL argument rests on it)
#   3. direct fp8 conv probe (the last live route to 2k img/s)
#   4. both-folds-OFF bench leg (completes the round-3 isolation matrix)
#   5. post-fold HLO profile (compile-only)
#   6. train batch sweep b32-96 x remat + grad-accum
# Protocol rule (VERDICT r3 #6): a measurement is DONE only when the doc
# paragraph citing it is committed — process this log into PERFORMANCE.md.
set -u
cd "$(dirname "$0")/.."
LOG=scratch/measure_r4.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
exec >> "$LOG" 2>&1

echo "=== $(date -u +%FT%TZ) round-4 measurement queue start ==="

echo "--- bench: per-mode fold defaults (dense fold: infer ON / train OFF) ---"
timeout 1800 python -u bench.py

echo "--- ceilings re-baseline ---"
timeout 1800 python -u scratch/ceilings_r4.py

echo "--- direct fp8 conv probe ---"
timeout 1800 python -u scratch/fp8_conv_probe.py

echo "--- bench: both folds OFF (completes r3 isolation matrix) ---"
UNET_TPU_DENSE_UP_FOLD=0 UNET_TPU_S2D_UP_FOLD=0 timeout 1800 python -u bench.py

echo "--- post-fold HLO profile (compile-only) ---"
timeout 1800 python -u scratch/post_fold_profile.py

echo "--- train batch sweep ---"
timeout 3600 python -u scratch/batch_sweep.py

echo "=== $(date -u +%FT%TZ) round-4 measurement queue done ==="
