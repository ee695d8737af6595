#!/usr/bin/env bash
# Continual-learning recipe with rehearsal (reference d_cmd.sh:2-22).
# Multi-host: launch once per host with COORDINATOR_ADDRESS/NUM_PROCESSES/
# PROCESS_ID set (jax.distributed), or on a TPU pod just run on every host.
set -e
read -p "Enter experiment name: " name
read -p "Enter model [resmoe_tiny_patch16_224_expert8]: " model
model=${model:-resmoe_tiny_patch16_224_expert8}
read -p "Enter data path: " data_path
read -p "Enter number of tasks [10]: " tasks

python -m slim_switch_moe_vit_tpu.main \
    --model "$model" \
    --data-set CIFAR100 --data-path "$data_path" \
    --batch-size 128 --lr 1e-3 --epochs 25 --unscale-lr \
    --num-tasks "${tasks:-10}" --rehearsal --rehearsal-batch-size 512 \
    --output_dir "out/$name"
