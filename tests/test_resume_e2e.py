"""End-to-end checkpoint/resume through ``main()`` (reference main.py:700-724:
restore model/optimizer/EMA/epoch and continue at start_epoch; checkpoint
payload per main.py:893-907).

Verifies the production crash-resume seam whole: a run saves per-epoch
checkpoints, a second invocation with ``--resume`` restores them, continues
at the NEXT epoch (no retraining of done epochs), keeps the optimizer step
count (not reset), and an ``--eval --resume`` invocation evaluates the
restored weights without training.
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


def test_resume_continues_training(tmp_path, capsys):
    out_dir = tmp_path / "out"

    args = _args(out_dir, ["--epochs", "2"])
    args.synth_size = 64
    main(args)
    first = capsys.readouterr().out
    assert "Epoch: [0]" in first and "Epoch: [1]" in first

    ckpt = _restore_raw(out_dir / "checkpoint")
    assert int(ckpt["epoch"]) == 1
    step_after_first = int(ckpt["step"])
    assert step_after_first == 4  # 2 epochs x 2 steps

    # resume with a larger horizon: must start at epoch 2, not retrain 0/1
    args = _args(out_dir, ["--epochs", "3",
                           "--resume", str(out_dir / "checkpoint")])
    args.synth_size = 64
    main(args)
    second = capsys.readouterr().out
    assert "Resumed from" in second and "at epoch 1" in second
    assert "Epoch: [2]" in second
    assert "Epoch: [0]" not in second and "Epoch: [1]" not in second

    ckpt2 = _restore_raw(out_dir / "checkpoint")
    assert int(ckpt2["epoch"]) == 2
    # optimizer step count CONTINUED from the restored state (not reset)
    assert int(ckpt2["step"]) == step_after_first + 2

    # the args sidecar lets a resumed run reconstruct its config
    from slim_switch_moe_vit_tpu.utils.checkpoint import load_checkpoint_args

    rec = load_checkpoint_args(str(out_dir / "checkpoint"))
    assert rec is not None and rec["model"] == "deit_tiny_patch16_224"


def test_eval_resume_does_not_train(tmp_path, capsys):
    out_dir = tmp_path / "out"
    args = _args(out_dir, ["--epochs", "1"])
    args.synth_size = 64
    main(args)
    capsys.readouterr()
    step_before = int(_restore_raw(out_dir / "checkpoint")["step"])

    args = _args(out_dir, ["--epochs", "1", "--eval",
                           "--resume", str(out_dir / "checkpoint")])
    args.synth_size = 64
    main(args)
    out = capsys.readouterr().out
    assert "Resumed from" in out
    assert "Acc@1" in out
    assert "Epoch: [" not in out  # no training happened
    # eval must not overwrite the checkpoint
    assert int(_restore_raw(out_dir / "checkpoint")["step"]) == step_before
    # restored logits are finite / accuracy parsed
    m = [ln for ln in out.splitlines() if "Acc@1" in ln]
    assert m and np.isfinite(float(m[-1].split("Acc@1")[1].split()[0]))


def test_compilation_cache_flag_populates_cache(tmp_path, capsys):
    """--compilation-cache-dir wires jax's persistent compile cache: the
    jitted steps land in the cache dir, so a restarted run skips their
    first-compile (production restart cost)."""
    import os

    out_dir = tmp_path / "out"
    cache_dir = tmp_path / "xla_cache"
    args = _args(out_dir, ["--epochs", "1",
                           "--compilation-cache-dir", str(cache_dir)])
    args.synth_size = 64
    # Earlier tests in the same process may have compiled an identical HLO;
    # jax's in-memory executable cache would then serve it and the persistent
    # cache would never be touched. Force a real compile.
    import jax
    import jax.numpy as jnp

    jax.clear_caches()
    # Bind jax's persistent-cache singleton to a DECOY dir first (exactly
    # what a prior in-process compile against another cache does — e.g. the
    # full suite compiles after `import bench` pointed it at .xla_cache).
    # The singleton ignores later config updates, so main() must reset it
    # for the flag to win; without that reset this test fails on the
    # os.listdir below regardless of suite ordering.
    decoy = tmp_path / "decoy_cache"
    jax.config.update("jax_compilation_cache_dir", str(decoy))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _ = jax.jit(lambda x: jnp.tanh(x) @ x)(jnp.ones((64, 64)))
    main(args)
    capsys.readouterr()
    entries = os.listdir(str(cache_dir))
    assert entries, "compilation cache dir is empty — flag not wired"


def test_plateau_state_survives_resume(tmp_path, capsys):
    """Plateau is STATEFUL (best/num_bad/current_lr) — the reference
    checkpoints lr_scheduler.state_dict() (main.py:900,714-718). A resumed
    plateau run must continue from the DECAYED lr, not reset to base."""
    import json

    out_dir = tmp_path / "out"
    plateau = ["--sched", "plateau", "--patience-epochs", "0",
               "--decay-rate", "0.5", "--lr", "0.008", "--unscale-lr",
               "--min-lr", "1e-5"]

    args = _args(out_dir, ["--epochs", "3"] + plateau)
    args.synth_size = 32
    main(args)
    capsys.readouterr()
    sidecar = json.load(open(out_dir / "checkpoint.sched.json"))
    lrs = [json.loads(l)["train_lr"]
           for l in (out_dir / "log.txt").read_text().splitlines()
           if l.strip()]
    assert min(lrs) <= 0.004 + 1e-12  # at least one decay happened pre-resume
    # the sidecar is rewritten AFTER the final epoch's observe, so it holds
    # the lr the NEXT epoch would train at (<= the last trained lr)
    assert sidecar["current_lr"] <= min(lrs) + 1e-15

    args = _args(out_dir, ["--epochs", "5",
                           "--resume", str(out_dir / "checkpoint")] + plateau)
    args.synth_size = 32
    main(args)
    second = capsys.readouterr().out
    assert "Resumed scheduler state" in second
    lrs2 = [json.loads(l)["train_lr"]
            for l in (out_dir / "log.txt").read_text().splitlines()
            if l.strip()]
    resumed = lrs2[3:]  # epochs 3,4 of the resumed run
    assert resumed, lrs2
    # every resumed epoch trains at or below the pre-resume decayed lr —
    # the bookkeeping was restored, not reset to base 0.008
    assert all(lr <= sidecar["current_lr"] + 1e-15 for lr in resumed), lrs2
