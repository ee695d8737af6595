"""Establish the golden baseline curves (SURVEY §6: "must be established").

Runs the reference math (torch oracle, tests/torch_oracle.py — the actual
reference cannot execute here: timm and the CUDA-only fmoe are not
installed) and this framework from IDENTICAL weights on IDENTICAL data for
50 AdamW steps, and records both loss curves into BASELINE.json["golden"].

Usage: python scripts/golden_baseline.py
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

STEPS = 50
LR, GATE_LR = 1e-3, 5e-4
THRESHOLD = 0.5


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from slim_switch_moe_vit_tpu import create_model, losses, optim
    from slim_switch_moe_vit_tpu.engine import make_train_step
    from slim_switch_moe_vit_tpu.train_state import create_train_state
    from torch_oracle import OracleResMoEViT, load_from_flax, train_losses

    model = create_model(
        "resmoe_tiny_patch16_224_expert8", num_classes=10, img_size=32,
        dispatch_mode="ragged", starting_threshold=THRESHOLD,
        target_threshold=THRESHOLD,
    )
    probe = create_train_state(model, (1, 32, 32, 3))
    opt_init, opt_update = optim.make_optimizer(probe.params,
                                                weight_decay=0.05)
    state = create_train_state(model, (1, 32, 32, 3), opt_init=opt_init)
    init_params = jax.tree.map(np.asarray, state.params)

    crit = losses.make_base_criterion(False, 0.1, False)
    step = make_train_step(model, opt_update, crit, donate=False)

    rs = np.random.RandomState(7)
    images = rs.randn(4, 16, 32, 32, 3).astype(np.float32)
    labels = rs.randint(0, 10, (4, 16))

    jax_curve = []
    for s in range(STEPS):
        state, metrics = step(
            state, jnp.asarray(images[s % 4]), jnp.asarray(labels[s % 4]),
            jnp.float32(LR), jnp.float32(GATE_LR))
        jax_curve.append(round(float(metrics["loss"]), 6))
        print(f"jax   step {s:3d}: {jax_curve[-1]:.6f}")

    torch.manual_seed(0)
    oracle = OracleResMoEViT(num_classes=10)
    load_from_flax(oracle, init_params)
    torch_curve = [round(v, 6) for v in train_losses(
        oracle, images, labels, STEPS, LR, GATE_LR, threshold=THRESHOLD)]
    for s, v in enumerate(torch_curve):
        print(f"torch step {s:3d}: {v:.6f}")

    rel = [abs(a - b) / max(abs(b), 1e-9)
           for a, b in zip(jax_curve, torch_curve)]
    summary = {
        "config": {
            "model": "resmoe_tiny_patch16_224_expert8 (img 32, 10 classes)",
            "steps": STEPS, "lr": LR, "gate_lr": GATE_LR,
            "threshold": THRESHOLD, "optimizer": "AdamW wd=0.05",
            "criterion": "label-smoothing CE (0.1)", "dtype": "f32",
            "batches": "4x16 synthetic, fixed seed 7, shared bit-exact",
        },
        "reference_torch_oracle_loss": torch_curve,
        "rebuild_jax_loss": jax_curve,
        "step0_rel_diff": rel[0],
        "max_rel_diff": max(rel),
        "mean_rel_diff": sum(rel) / len(rel),
        "note": ("reference cannot execute here (timm + CUDA fmoe missing); "
                 "oracle implements its formulas — see tests/torch_oracle.py. "
                 "Divergence beyond ~step 2 is intrinsic: STE hard gates flip "
                 "discretely on fp noise (tests/test_golden_torch_parity.py)."),
    }
    path = "/root/repo/BASELINE.json"
    base = json.load(open(path))
    base["golden"] = summary
    json.dump(base, open(path, "w"), indent=2)
    print(f"\nwrote golden curves to {path}")
    print(f"step0 rel diff {rel[0]:.2e}, max {max(rel):.3f}, "
          f"mean {summary['mean_rel_diff']:.3f}")


if __name__ == "__main__":
    main()
