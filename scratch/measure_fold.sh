#!/bin/bash
# Round-3 measurement queue (VERDICT round-2 #1-#3, #8). Serial: the box has
# ONE host CPU core — concurrent runs starve each other. The default-config
# bench leg (folds ON) already ran: 641.9 infer / 159.1 train img/s/chip.
# Logs append to scratch/measure_r3.log. Compiles over the tunnel are slow
# (~10 min for the b128 inference graph) — persistent compilation cache on.
set -u
cd "$(dirname "$0")/.."
LOG=scratch/measure_r3.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
exec >> "$LOG" 2>&1

echo "=== $(date -u +%FT%TZ) measurement queue start ==="

echo "--- fp8 probe (decision lever: any sub-bf16 speedup?) ---"
timeout 1800 python -u scratch/fp8_probe.py

echo "--- bench: dense fold OFF (isolate the round-2 dense fold) ---"
UNET_TPU_DENSE_UP_FOLD=0 timeout 1800 python -u bench.py

echo "--- bench: both folds OFF ---"
UNET_TPU_DENSE_UP_FOLD=0 UNET_TPU_S2D_UP_FOLD=0 timeout 1800 python -u bench.py

echo "--- post-fold HLO profile (compile-only, no execution) ---"
timeout 1800 python -u scratch/post_fold_profile.py

echo "--- train batch sweep ---"
timeout 3600 python -u scratch/batch_sweep.py

echo "=== $(date -u +%FT%TZ) measurement queue done ==="
