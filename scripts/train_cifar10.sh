#!/usr/bin/env bash
# CIFAR-10 from-scratch recipe (reference cmd.sh:2-13), TPU-native driver.
set -e
read -p "Enter experiment name: " name
read -p "Enter model [resmoe_tiny_patch16_224_expert8]: " model
model=${model:-resmoe_tiny_patch16_224_expert8}
read -p "Enter data path: " data_path
read -p "Enter starting threshold [1.0]: " st
read -p "Enter target threshold [0.9]: " tt

python -m slim_switch_moe_vit_tpu.main \
    --model "$model" \
    --data-set CIFAR10 --data-path "$data_path" \
    --batch-size 128 --lr 1e-3 --epochs 300 --unscale-lr \
    --no-repeated-aug \
    --starting-threshold "${st:-1.0}" --target-threshold "${tt:-0.9}" \
    --output_dir "out/$name"
