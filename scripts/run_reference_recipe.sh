#!/usr/bin/env bash
# The EXACT reference CIFAR-10 from-scratch recipe (/root/reference/cmd.sh:7-13)
# as one non-interactive command, with a preflight that says what is missing.
#
# Usage:
#   scripts/run_reference_recipe.sh DATA_PATH [MODEL] [SEED] [START_T] [TARGET_T]
#
# Defaults mirror cmd.sh's prompts: model deit_tiny_patch16_224, seed 0,
# thresholds 1.0 -> 0.9 (thresholds only act on resmoe_* models).
# Flags are cmd.sh's verbatim: lr 1e-3, epochs 300, wd 0.05, cosine, 224px,
# eval-crop-ratio 1.0, reprob 0, smoothing 0.1, warmup 5, drop 0, adamw,
# warmup-lr 1e-6, mixup .8, drop-path 0, cutmix 1.0, unscale-lr,
# no-repeated-aug, rand-m9-mstd0.5-inc1.
set -euo pipefail

DATA_PATH="${1:-}"
MODEL="${2:-deit_tiny_patch16_224}"
SEED="${3:-0}"
START_T="${4:-1.0}"
TARGET_T="${5:-0.9}"

fail=0
if [[ -z "$DATA_PATH" ]]; then
    echo "MISSING: DATA_PATH argument." >&2
    echo "  Usage: $0 DATA_PATH [MODEL] [SEED] [START_T] [TARGET_T]" >&2
    exit 2
fi
BASE="$DATA_PATH/cifar-10-batches-py"
if [[ ! -d "$BASE" ]]; then
    echo "MISSING: $BASE (the CIFAR-10 python pickle directory)." >&2
    echo "  Expected layout: DATA_PATH/cifar-10-batches-py/{data_batch_1..5,test_batch}" >&2
    echo "  Get it from https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz" >&2
    echo "  (this environment has no network egress — mount/copy it in)." >&2
    fail=1
else
    for f in data_batch_1 data_batch_2 data_batch_3 data_batch_4 data_batch_5 test_batch; do
        if [[ ! -f "$BASE/$f" ]]; then
            echo "MISSING: $BASE/$f" >&2
            fail=1
        fi
    done
fi
if [[ $fail -ne 0 ]]; then
    echo "Preflight FAILED — fix the items above and re-run." >&2
    exit 2
fi
echo "Preflight OK: CIFAR-10 pickles present under $BASE"

OUT="cifar-models/$MODEL/scratch_${START_T}_${TARGET_T}/$SEED"
mkdir -p "$OUT"
exec python -m slim_switch_moe_vit_tpu.main \
    --model "$MODEL" \
    --data-set CIFAR10 --data-path "$DATA_PATH" \
    --batch-size 128 \
    --lr 1e-3 --epochs 300 --weight-decay 0.05 --sched cosine --input-size 224 \
    --eval-crop-ratio 1.0 --reprob 0.0 --smoothing 0.1 --warmup-epochs 5 --drop 0.0 \
    --seed "$SEED" --opt adamw --warmup-lr 1e-6 --mixup .8 --drop-path 0.0 --cutmix 1.0 \
    --unscale-lr --no-repeated-aug --aa rand-m9-mstd0.5-inc1 \
    --starting-threshold "$START_T" --target-threshold "$TARGET_T" \
    --output_dir "$OUT"
