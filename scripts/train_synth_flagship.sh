#!/usr/bin/env bash
# Flagship-scale end-to-end learning artifact on real TPU (VERDICT r3 #7):
# ViT-S/16 Switch-8E (the bench flagship model) on the learnable SYNTH task,
# ~20 epochs at 224px/b128. Records the accuracy curve for BASELINE.json's
# golden section. Hyperparameters follow the verified tiny-scale recipe
# (.claude/skills/verify/SKILL.md): lr 3e-4 unscaled, warmup 2, augmentation
# off so the synthetic brightness cue survives.
#
# Usage: scripts/train_synth_flagship.sh [EPOCHS] [OUT_DIR]
set -euo pipefail
EPOCHS="${1:-20}"
OUT="${2:-/tmp/synth_flagship}"

exec python -m slim_switch_moe_vit_tpu.main \
    --data-set SYNTH --synth-learnable --synth-size 5120 \
    --model moe_small_patch16_224_expert8 \
    --batch-size 128 --epochs "$EPOCHS" --input-size 224 \
    --no-repeated-aug --mixup 0 --cutmix 0 --reprob 0 \
    --aa '' --color-jitter 0 --smoothing 0 --drop-path 0 \
    --lr 3e-4 --unscale-lr --warmup-epochs 2 \
    --output_dir "$OUT"
