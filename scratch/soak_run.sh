#!/bin/bash
# Round-5 reference-scale soak (VERDICT r4 #1): the real CLI end-to-end on
# TPU at the reference's data volume — 8,646 train / 1,418 val 512² jpgs per
# epoch through the real host loader (decode cache ON), full validation
# passes, checkpoint cadence 2, kill+resume mid-run, final test-set eval.
#
# Usage:
#   scratch/soak_run.sh phase1   # epochs 1..8, killed externally mid-run
#   scratch/soak_run.sh resume <ckpt-dir>  # resume to epoch 8
#   scratch/soak_run.sh eval <best-model-dir>
set -e
cd /root/repo
SOAK=/root/soak
OUT=$SOAK/run_our_unet
case "$1" in
  phase1)
    python -m unet_implementations_tpu.cli our_unet train \
      --data_dir $SOAK/processed --output_dir $OUT \
      --decode_cache $SOAK/cache \
      --batch_size 32 --epochs 8 --save_every 2 --seed 0
    ;;
  resume)
    python -m unet_implementations_tpu.cli our_unet train \
      --data_dir $SOAK/processed --output_dir $OUT \
      --decode_cache $SOAK/cache \
      --batch_size 32 --epochs 8 --save_every 2 --seed 0 \
      --resume "$2"
    ;;
  eval)
    python -m unet_implementations_tpu.cli our_unet evaluate \
      --model_path "$2" --data_dir $SOAK/processed \
      --output_dir $OUT/evaluation_results \
      --decode_cache $SOAK/cache --batch_size 32
    ;;
  *) echo "usage: $0 phase1|resume <ckpt>|eval <model>"; exit 2;;
esac
