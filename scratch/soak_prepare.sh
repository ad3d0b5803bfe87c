#!/bin/bash
# Round-5 soak dataset preparation: reference-scale synthetic raw archive
# -> pipeline -> 2x/2x offline augmentation (train epoch ~8.6k images).
# Runs entirely on the CPU backend so the TPU stays free for probe work.
set -e
export JAX_PLATFORMS=cpu
cd /root/repo
SOAK=${1:-/root/soak}
echo "=== gen raw ($(date -u +%H:%M:%S)) ==="
python scratch/gen_soak_raw.py "$SOAK/raw"
echo "=== pipeline ($(date -u +%H:%M:%S)) ==="
python -m unet_implementations_tpu.cli pipeline \
  --raw_dir "$SOAK/raw" --processed_dir "$SOAK/processed" \
  --val_ratio 0.33 --seed 1
echo "=== augment 2x/2x ($(date -u +%H:%M:%S)) ==="
python -m unet_implementations_tpu.cli augment \
  --data_dir "$SOAK/processed" \
  --cat_augmentations 2 --dog_augmentations 2 --seed 0
echo "=== counts ==="
for d in Train/resized Train/augmented/images Val/resized Test/resized; do
  echo "$d: $(ls "$SOAK/processed/$d" | wc -l)"
done
echo "=== done ($(date -u +%H:%M:%S)) ==="
