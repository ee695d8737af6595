#!/usr/bin/env bash
# Token-skip threshold sweep (reference d_cmd_exp.sh:6-25):
# seeds {0,1,2} x start {1.0,0.9,0.7,0.5} x target-diff {0,0.1,0.2,0.4}.
set -e
data_path=${1:?usage: sweep_thresholds.sh <data_path> [out_root]}
out_root=${2:-out/sweep}

for seed in 0 1 2; do
  for start in 1.0 0.9 0.7 0.5; do
    for diff in 0 0.1 0.2 0.4; do
      target=$(python -c "print(max(0.0, $start - $diff))")
      name="seed${seed}_st${start}_tt${target}"
      echo "=== $name ==="
      python -m slim_switch_moe_vit_tpu.main \
          --model resmoe_tiny_patch16_224_expert8 \
          --data-set CIFAR10 --data-path "$data_path" \
          --batch-size 128 --lr 1e-3 --epochs 300 --unscale-lr \
          --no-repeated-aug --seed "$seed" \
          --starting-threshold "$start" --target-threshold "$target" \
          --output_dir "$out_root/$name"
    done
  done
done
