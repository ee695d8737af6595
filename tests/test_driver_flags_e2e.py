"""End-to-end driver smoke for the r4 flag surface through ``main()``:
``--opt sgd --sched step`` (the timm surface beyond adamw/cosine,
reference main.py:729-734), ``--async-checkpoint`` (background Orbax
commit + exit barrier), and ``--fused-optimizer`` (single-pass Pallas
AdamW+EMA, ops/fused_adamw.py). Unit tests pin each piece's math; this
pins the WIRING — the combinations actually train, checkpoint, and stay
finite when driven exactly as a user would.
"""
import numpy as np

from slim_switch_moe_vit_tpu.config import get_args_parser
from slim_switch_moe_vit_tpu.main import main


def _args(out_dir, extra):
    return get_args_parser().parse_args([
        "--model", "deit_tiny_patch16_224",
        "--data-set", "SYNTH", "--input-size", "32",
        "--batch-size", "8", "--warmup-epochs", "0",
        "--max-steps-per-epoch", "2", "--num_workers", "1",
        "--no-repeated-aug",
        "--output_dir", str(out_dir),
    ] + extra)


def _restore_raw(path):
    import os

    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(os.path.abspath(str(path)))


def test_sgd_step_schedule_trains_e2e(tmp_path, capsys):
    args = _args(tmp_path / "out", [
        "--epochs", "1", "--opt", "sgd", "--sched", "step",
        "--decay-epochs", "1", "--decay-rate", "0.5", "--momentum", "0.9",
    ])
    args.synth_size = 32
    main(args)
    out = capsys.readouterr().out
    assert "Epoch: [0]" in out
    ckpt = _restore_raw(tmp_path / "out" / "checkpoint")
    # sgd state: optax.trace — no Adam mu/nu count, but params must be arrays
    leaves = [v for v in np.asarray(
        list(ckpt["params"]["head"]["kernel"].ravel()))]
    assert np.isfinite(leaves).all()


def test_async_checkpoint_e2e(tmp_path, capsys):
    args = _args(tmp_path / "out", [
        "--epochs", "2", "--async-checkpoint",
    ])
    args.synth_size = 32
    main(args)  # wait_for_checkpoints() runs before main() returns
    ckpt = _restore_raw(tmp_path / "out" / "checkpoint")
    assert int(ckpt["epoch"]) == 1
    assert np.isfinite(
        np.asarray(ckpt["params"]["head"]["kernel"])).all()


def test_fused_optimizer_e2e_matches_optax(tmp_path, capsys):
    """--fused-optimizer must produce the same trained params as the optax
    chain (same math by contract, ops/fused_adamw.py tests pin the kernel;
    this pins the main.py wiring end-to-end)."""
    a1 = _args(tmp_path / "o1", ["--epochs", "1", "--model-ema"])
    a1.synth_size = 32
    main(a1)
    a2 = _args(tmp_path / "o2", ["--epochs", "1", "--model-ema",
                                 "--fused-optimizer"])
    a2.synth_size = 32
    main(a2)
    c1 = _restore_raw(tmp_path / "o1" / "checkpoint")
    c2 = _restore_raw(tmp_path / "o2" / "checkpoint")
    k1 = np.asarray(c1["params"]["head"]["kernel"])
    k2 = np.asarray(c2["params"]["head"]["kernel"])
    np.testing.assert_allclose(k2, k1, atol=2e-6, rtol=1e-5)
    e1 = np.asarray(c1["ema_params"]["head"]["kernel"])
    e2 = np.asarray(c2["ema_params"]["head"]["kernel"])
    np.testing.assert_allclose(e2, e1, atol=2e-6, rtol=1e-5)


def test_plateau_schedule_trains_e2e_and_decays(tmp_path, capsys):
    """--sched plateau through main(): trains, feeds each epoch's eval acc1
    into the scheduler, and with patience 0 + a constant-accuracy SYNTH eval
    the lr decays every post-warmup epoch (visible in the per-epoch lr the
    engine logs)."""
    args = _args(tmp_path / "out", [
        "--epochs", "3", "--sched", "plateau",
        "--patience-epochs", "0", "--decay-rate", "0.5",
        "--lr", "0.008", "--unscale-lr", "--min-lr", "1e-5",
    ])
    args.synth_size = 32
    main(args)
    out = capsys.readouterr().out
    assert "Epoch: [2]" in out
    # per-epoch lr from the reference-format log.txt JSON lines: epoch 0
    # trains at base lr; epoch 1 keeps base (the first observe only seeds
    # "best"); epoch 2 decays — SYNTH eval accuracy is deterministic at this
    # seed and does not improve, so patience 0 fires on the second observe
    import json

    lrs = [json.loads(l)["train_lr"]
           for l in (tmp_path / "out" / "log.txt").read_text().splitlines()
           if l.strip()]
    assert lrs[0] == 0.008 and lrs[1] == 0.008
    assert min(lrs) <= 0.004 + 1e-12  # at least one plateau decay fired


def test_radam_tanh_schedule_trains_e2e(tmp_path, capsys):
    """r5 surface: --opt radam --sched tanh through main() end to end."""
    args = _args(tmp_path / "out", [
        "--epochs", "1", "--opt", "radam", "--sched", "tanh",
    ])
    args.synth_size = 32
    main(args)
    out = capsys.readouterr().out
    assert "Epoch: [0]" in out
    ckpt = _restore_raw(tmp_path / "out" / "checkpoint")
    assert np.isfinite(np.asarray(ckpt["params"]["head"]["kernel"])).all()


def test_rmsprop_trains_e2e(tmp_path, capsys):
    args = _args(tmp_path / "out", [
        "--epochs", "1", "--opt", "rmsprop", "--momentum", "0.9",
    ])
    args.synth_size = 32
    main(args)
    assert "Epoch: [0]" in capsys.readouterr().out
    ckpt = _restore_raw(tmp_path / "out" / "checkpoint")
    assert np.isfinite(np.asarray(ckpt["params"]["head"]["kernel"])).all()
