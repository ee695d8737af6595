"""Establish the golden baseline curves (SURVEY §6: "must be established").

Runs the reference math (torch oracle, tests/torch_oracle.py — the actual
reference cannot execute here: timm and the CUDA-only fmoe are not
installed) and this framework from IDENTICAL weights on IDENTICAL data, and
records the loss curves into BASELINE.json["golden"], one entry per config:

- resmoe_tiny      200 AdamW steps, dropless ragged dispatch (the flagship
                   semantics: STE gates + NaiveGate top-2 MoE)
- distilled_deit   50 steps, dual heads + soft KD vs a frozen teacher
- capacity_drop    50 steps, finite capacity_factor -> real token drops on
                   both sides (token-major slot priority)
- sparse_search    50 steps, CE + L1-zeta search + budget compression with
                   element-exact mask agreement (SURVEY 2.7/2.8)
- switchable       50 steps, centroid-bucketed SwitchableLayerNorm training
                   (SURVEY 2.5/2.6)

Usage: python scripts/golden_baseline.py
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

LR, GATE_LR = 1e-3, 5e-4
THRESHOLD = 0.5


def _drift(jax_curve, torch_curve):
    rel = [abs(a - b) / max(abs(b), 1e-9)
           for a, b in zip(jax_curve, torch_curve)]
    return {"step0_rel_diff": rel[0], "max_rel_diff": max(rel),
            "mean_rel_diff": sum(rel) / len(rel)}


def _run_resmoe(steps, dispatch_mode, capacity_factor, batches, batch,
                seed=7):
    """Shared harness: jax resmoe_tiny vs the torch oracle, same weights,
    same batches. Returns (summary_dict)."""
    import jax
    import jax.numpy as jnp
    import torch

    from slim_switch_moe_vit_tpu import create_model, losses, optim
    from slim_switch_moe_vit_tpu.engine import make_train_step
    from slim_switch_moe_vit_tpu.ops.moe import compute_capacity
    from slim_switch_moe_vit_tpu.train_state import create_train_state
    from torch_oracle import OracleResMoEViT, load_from_flax, train_losses

    model = create_model(
        "resmoe_tiny_patch16_224_expert8", num_classes=10, img_size=32,
        dispatch_mode=dispatch_mode, capacity_factor=capacity_factor,
        starting_threshold=THRESHOLD, target_threshold=THRESHOLD,
    )
    probe = create_train_state(model, (1, 32, 32, 3))
    opt_init, opt_update = optim.make_optimizer(probe.params,
                                                weight_decay=0.05)
    state = create_train_state(model, (1, 32, 32, 3), opt_init=opt_init)
    if dispatch_mode == "capacity":
        # break the step-0 all-zero router-logit ties (implementation-defined
        # top-k order would consume different experts' capacity slots) — see
        # tests/test_golden_torch_parity.py::perturb_router_bias
        from test_golden_torch_parity import perturb_router_bias
        state = state.replace(params=perturb_router_bias(state.params))
    init_params = jax.tree.map(np.asarray, state.params)

    crit = losses.make_base_criterion(False, 0.1, False)
    step = make_train_step(model, opt_update, crit, donate=False)

    rs = np.random.RandomState(seed)
    images = rs.randn(batches, batch, 32, 32, 3).astype(np.float32)
    labels = rs.randint(0, 10, (batches, batch))

    jax_curve = []
    for s in range(steps):
        state, metrics = step(
            state, jnp.asarray(images[s % batches]),
            jnp.asarray(labels[s % batches]),
            jnp.float32(LR), jnp.float32(GATE_LR))
        jax_curve.append(round(float(metrics["loss"]), 6))
        if s % 20 == 0:
            print(f"  jax step {s:3d}: {jax_curve[-1]:.6f}", flush=True)

    cap = None
    if dispatch_mode == "capacity":
        n_tok = batch * ((32 // 16) ** 2 + 1)
        cap = compute_capacity(n_tok, 8, 2, capacity_factor)
        print(f"  capacity = {cap} slots/expert ({n_tok} tokens x2 choices)")

    torch.manual_seed(0)
    oracle = OracleResMoEViT(num_classes=10, capacity=cap)
    load_from_flax(oracle, init_params)
    torch_curve = [round(v, 6) for v in train_losses(
        oracle, images, labels, steps, LR, GATE_LR, threshold=THRESHOLD)]

    return {
        "config": {
            "model": "resmoe_tiny_patch16_224_expert8 (img 32, 10 classes)",
            "steps": steps, "lr": LR, "gate_lr": GATE_LR,
            "threshold": THRESHOLD, "optimizer": "AdamW wd=0.05",
            "criterion": "label-smoothing CE (0.1)", "dtype": "f32",
            "dispatch": dispatch_mode, "capacity_factor": capacity_factor,
            "capacity_slots": cap,
            "batches": f"{batches}x{batch} synthetic, fixed seed {seed}, "
                       "shared bit-exact",
        },
        "reference_torch_oracle_loss": torch_curve,
        "rebuild_jax_loss": jax_curve,
        **_drift(jax_curve, torch_curve),
    }


def _run_distilled(steps=50, alpha=0.5, tau=3.0):
    import jax
    import jax.numpy as jnp
    import torch

    from slim_switch_moe_vit_tpu import create_model, losses, optim
    from slim_switch_moe_vit_tpu.engine import make_train_step
    from slim_switch_moe_vit_tpu.train_state import create_train_state
    from torch_oracle import OracleViT, load_from_flax_vit, \
        train_losses_distilled

    student = create_model("deit_tiny_distilled_patch16_224", num_classes=10,
                           img_size=32)
    teacher = create_model("deit_tiny_patch16_224", num_classes=10,
                           img_size=32)
    t_state = create_train_state(teacher, (1, 32, 32, 3), seed=1)
    t_vars = {"params": t_state.params}

    def teacher_apply(images):
        return teacher.apply(t_vars, images, deterministic=True)

    probe = create_train_state(student, (1, 32, 32, 3))
    opt_init, opt_update = optim.make_optimizer(probe.params,
                                                weight_decay=0.05)
    state = create_train_state(student, (1, 32, 32, 3), opt_init=opt_init)
    init_params = jax.tree.map(np.asarray, state.params)
    teacher_params = jax.tree.map(np.asarray, t_state.params)

    crit = losses.make_base_criterion(False, 0.1, False)
    step = make_train_step(student, opt_update, crit,
                           distillation_type="soft", alpha=alpha, tau=tau,
                           teacher_apply=teacher_apply, donate=False)

    rs = np.random.RandomState(11)
    images = rs.randn(4, 16, 32, 32, 3).astype(np.float32)
    labels = rs.randint(0, 10, (4, 16))

    jax_curve = []
    for s in range(steps):
        state, metrics = step(
            state, jnp.asarray(images[s % 4]), jnp.asarray(labels[s % 4]),
            jnp.float32(LR), jnp.float32(LR))
        jax_curve.append(round(float(metrics["loss"]), 6))
        if s % 20 == 0:
            print(f"  jax step {s:3d}: {jax_curve[-1]:.6f}", flush=True)

    torch.manual_seed(0)
    o_student = OracleViT(num_classes=10, distilled=True)
    o_teacher = OracleViT(num_classes=10, distilled=False)
    load_from_flax_vit(o_student, init_params)
    load_from_flax_vit(o_teacher, teacher_params)
    torch_curve = [round(v, 6) for v in train_losses_distilled(
        o_student, o_teacher, images, labels, steps, LR, alpha, tau)]

    return {
        "config": {
            "model": "deit_tiny_distilled_patch16_224 (img 32, 10 classes)",
            "teacher": "deit_tiny_patch16_224 (random init, seed 1)",
            "steps": steps, "lr": LR, "alpha": alpha, "tau": tau,
            "optimizer": "AdamW wd=0.05",
            "criterion": "smoothed CE (cls head) + soft KD (dist head)",
            "dtype": "f32",
            "batches": "4x16 synthetic, fixed seed 11, shared bit-exact",
        },
        "reference_torch_oracle_loss": torch_curve,
        "rebuild_jax_loss": jax_curve,
        **_drift(jax_curve, torch_curve),
    }


def _run_sparse(steps=50, w_sparse=2e-4):
    """Sparse-pruning search phase (SURVEY 2.7/2.8): smoothed CE + L1 zeta
    loss, then budget compression — loss curves AND the binarized masks must
    match the oracle (tests/test_golden_sparse_parity.py guards both)."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from slim_switch_moe_vit_tpu import create_model, losses
    from slim_switch_moe_vit_tpu.models import sparse as sp
    from test_golden_sparse_parity import _jitter_zetas
    from torch_oracle import (OracleSparseViT, load_from_flax_sparse,
                              sparse_compress, train_losses_sparse)

    model = create_model("sparse_deit_tiny_patch16_224", num_classes=10,
                         img_size=32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)), deterministic=True)
    params = _jitter_zetas(variables["params"])
    pruning = variables[sp.PRUNING_COLLECTION]

    torch.manual_seed(0)
    oracle = OracleSparseViT(num_classes=10)
    load_from_flax_sparse(oracle, jax.tree.map(np.asarray, params))

    crit = losses.make_base_criterion(False, 0.1, False)
    tx = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(
                {"params": p, sp.PRUNING_COLLECTION: pruning}, x,
                deterministic=True)
            la, lm, lp = sp.get_sparsity_loss(p)
            return crit(logits, y) + w_sparse * (la + lm + lp)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rs = np.random.RandomState(11)
    images = rs.randn(2, 8, 32, 32, 3).astype(np.float32)
    labels = rs.randint(0, 10, (2, 8))

    jax_curve = []
    for s in range(steps):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images[s % 2]),
            jnp.asarray(labels[s % 2]))
        jax_curve.append(round(float(loss), 6))
        if s % 20 == 0:
            print(f"  jax step {s:3d}: {jax_curve[-1]:.6f}", flush=True)

    torch_curve = [round(v, 6) for v in train_losses_sparse(
        oracle, images, labels, steps, LR, w_sparse)]

    # post-training compression agreement (masks must be element-exact)
    budgets = (0.5, 0.6, 0.7)
    new_pruning, (ta_j, tm_j, _) = sp.compress(params, pruning, *budgets)
    ta_t, tm_t, _ = sparse_compress(oracle, *budgets)
    mask_mismatches = 0
    for i, blk in enumerate(oracle.blocks):
        a = sp._get(new_pruning, (f"blocks_{i}", "attn"))
        m = sp._get(new_pruning, (f"blocks_{i}", "mlp"))
        mask_mismatches += int(np.sum(
            np.asarray(a["searched_zeta"]) != blk.attn.searched_zeta.numpy()))
        mask_mismatches += int(np.sum(
            np.asarray(a["searched_patch_zeta"])
            != blk.attn.searched_patch_zeta.numpy()))
        mask_mismatches += int(np.sum(
            np.asarray(m["searched_zeta"]) != blk.mlp.searched_zeta.numpy()))

    return {
        "config": {
            "model": "sparse_deit_tiny_patch16_224 (img 32, 10 classes)",
            "steps": steps, "lr": LR, "w_sparse": w_sparse,
            "optimizer": "AdamW wd=0 (plain; wd-mask parity covered by the "
                         "other configs)",
            "criterion": "label-smoothing CE (0.1) + w*L1(zetas)",
            "dtype": "f32", "budgets_attn_mlp_patch": list(budgets),
            "batches": "2x8 synthetic, fixed seed 11, shared bit-exact; "
                       "zetas jittered U[0,1) seed 5 on both sides",
        },
        "reference_torch_oracle_loss": torch_curve,
        "rebuild_jax_loss": jax_curve,
        "compress_threshold_attn": [float(ta_j), float(ta_t)],
        "compress_threshold_mlp": [float(tm_j), float(tm_t)],
        "compressed_mask_mismatches": mask_mismatches,
        **_drift(jax_curve, torch_curve),
    }


def _run_switchable(steps=50):
    """Switchable subsystem (SURVEY 2.5/2.6): centroid-bucketed
    SwitchableLayerNorm training — the jax gather-based per-bucket affine vs
    the torch index_select restatement of the reference's boolean-mask loop."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from slim_switch_moe_vit_tpu import create_model, losses
    from slim_switch_moe_vit_tpu.models.switchable import (
        CENTROID_COLLECTION, SwitchableLayerNorm)
    from test_golden_switchable_parity import _jitter_router
    from torch_oracle import (OracleSwitchableViT, load_from_flax_switchable,
                              train_losses_switchable)

    BUCKETS = 4
    model = create_model("deit_sw_tiny_patch16_224", num_classes=10,
                         img_size=32, buckets=BUCKETS)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)), deterministic=True)
    params = _jitter_router(variables["params"])
    rs = np.random.RandomState(13)
    centroids = (rs.randn(BUCKETS, 192) * 0.5).astype(np.float32)
    variables = SwitchableLayerNorm.set_centroids(
        {**variables, "params": params}, ("router",), jnp.asarray(centroids))
    cent_col = variables[CENTROID_COLLECTION]

    torch.manual_seed(0)
    oracle = OracleSwitchableViT(num_classes=10, buckets=BUCKETS)
    load_from_flax_switchable(oracle, jax.tree.map(np.asarray, params),
                              centroids)

    crit = losses.make_base_criterion(False, 0.1, False)
    tx = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(
                {"params": p, CENTROID_COLLECTION: cent_col}, x,
                deterministic=True)
            return crit(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    images = rs.randn(2, 8, 32, 32, 3).astype(np.float32)
    labels = rs.randint(0, 10, (2, 8))

    jax_curve = []
    for s in range(steps):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images[s % 2]),
            jnp.asarray(labels[s % 2]))
        jax_curve.append(round(float(loss), 6))
        if s % 20 == 0:
            print(f"  jax step {s:3d}: {jax_curve[-1]:.6f}", flush=True)

    torch_curve = [round(v, 6) for v in train_losses_switchable(
        oracle, images, labels, steps, LR)]

    return {
        "config": {
            "model": f"deit_sw_tiny_patch16_224 (img 32, 10 classes, "
                     f"{BUCKETS} buckets)",
            "steps": steps, "lr": LR,
            "optimizer": "AdamW wd=0 (plain; wd-mask parity covered by the "
                         "other configs)",
            "criterion": "label-smoothing CE (0.1)", "dtype": "f32",
            "batches": "2x8 synthetic, fixed seed 13, shared bit-exact; "
                       "router affine jittered seed 9, centroids seed 13",
        },
        "reference_torch_oracle_loss": torch_curve,
        "rebuild_jax_loss": jax_curve,
        **_drift(jax_curve, torch_curve),
    }


def _run_recipe(steps=300, steps_per_epoch=10, batch=16, ema_decay=0.99996):
    """Golden config 6 (VERDICT r4 #7): the full cmd.sh recipe math.

    The reference recipe (``/root/reference/cmd.sh:7-13``) is: RandAugment
    rand-m9-mstd0.5-inc1 + random erasing + mixup 0.8 / cutmix 1.0 with
    smoothing 0.1 folded into soft targets -> SoftTargetCrossEntropy ->
    AdamW wd 0.05 + epoch-granular cosine LR (warmup 5) -> ModelEma 0.99996
    (``main.py:505-517,597-607,653-657,729-734``; ``engine.py:22-85``).

    Shared-batch protocol: the on-device aug pipeline (data/device_aug.py +
    data/mixup.py) generates each step's augmented images and mixup soft
    targets ONCE, and the identical float batches feed both this framework
    and the torch oracle — so RNG-stream differences are out of the
    comparison and what is measured is the full recipe's training math:
    forward/backward through STE gates + dropless MoE, soft-target CE,
    cosine-scheduled AdamW with the gate LR group, and the EMA trajectory.
    The only recipe ingredient NOT exercised is the real dataset.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from slim_switch_moe_vit_tpu import create_model, losses, optim
    from slim_switch_moe_vit_tpu.data.device_aug import build_device_augment
    from slim_switch_moe_vit_tpu.data.mixup import make_mixup_fn
    from slim_switch_moe_vit_tpu.engine import make_train_step
    from slim_switch_moe_vit_tpu.train_state import create_train_state
    from torch_oracle import OracleResMoEViT, load_from_flax, \
        train_losses_recipe

    epochs = steps // steps_per_epoch
    sched = optim.TimmCosineSchedule(LR, epochs, warmup_epochs=5,
                                     warmup_lr=1e-6, min_lr=1e-5)
    lrs = [sched(s // steps_per_epoch) for s in range(steps)]
    gate_lrs = [GATE_LR * sched.scale(s // steps_per_epoch)
                for s in range(steps)]

    # ---- shared-batch protocol: generate all augmented batches once ----
    aug = build_device_augment(input_size=32, aa="rand-m9-mstd0.5-inc1",
                               hflip=0.5, color_jitter=0.3, reprob=0.25)
    mix = make_mixup_fn(mixup_alpha=0.8, cutmix_alpha=1.0, prob=1.0,
                        switch_prob=0.5, label_smoothing=0.1, num_classes=10)

    @jax.jit
    def make_batch(key, raw, labels):
        k_aug, k_mix = jax.random.split(key)
        x = aug(k_aug, raw)
        return mix(k_mix, x, labels)

    rs = np.random.RandomState(17)
    nb = steps_per_epoch  # one pass over the raw set per epoch
    raw = rs.randint(0, 256, (nb, batch, 32, 32, 3)).astype(np.uint8)
    raw_labels = rs.randint(0, 10, (nb, batch))
    images = np.empty((steps, batch, 32, 32, 3), np.float32)
    targets = np.empty((steps, batch, 10), np.float32)
    key = jax.random.PRNGKey(99)
    for s in range(steps):
        x, t = make_batch(jax.random.fold_in(key, s),
                          jnp.asarray(raw[s % nb]),
                          jnp.asarray(raw_labels[s % nb]))
        images[s] = np.asarray(x)
        targets[s] = np.asarray(t)
    # eval batch: plain normalize (no aug), never trained on
    from slim_switch_moe_vit_tpu.data.device_aug import build_eval_normalize
    eval_x = np.asarray(build_eval_normalize()(jnp.asarray(
        rs.randint(0, 256, (64, 32, 32, 3)).astype(np.uint8))))
    eval_y = rs.randint(0, 10, (64,))

    # ---- this framework ----
    model = create_model(
        "resmoe_tiny_patch16_224_expert8", num_classes=10, img_size=32,
        dispatch_mode="ragged", capacity_factor=2.0,
        starting_threshold=THRESHOLD, target_threshold=THRESHOLD)
    probe = create_train_state(model, (1, 32, 32, 3))
    opt_init, opt_update = optim.make_optimizer(probe.params,
                                                weight_decay=0.05)
    state = create_train_state(model, (1, 32, 32, 3), opt_init=opt_init,
                               use_ema=True)
    init_params = jax.tree.map(np.asarray, state.params)
    crit = losses.make_base_criterion(True, 0.1, False)  # soft-target CE
    step = make_train_step(model, opt_update, crit, ema_decay=ema_decay,
                           donate=False)

    jax_curve = []
    for s in range(steps):
        state, metrics = step(state, jnp.asarray(images[s]),
                              jnp.asarray(targets[s]),
                              jnp.float32(lrs[s]), jnp.float32(gate_lrs[s]))
        jax_curve.append(round(float(metrics["loss"]), 6))
        if s % 50 == 0:
            print(f"  jax step {s:3d}: {jax_curve[-1]:.6f} "
                  f"(lr {lrs[s]:.2e})", flush=True)

    def eval_loss(params):
        variables = {"params": params}
        if state.gates:
            variables["gates"] = state.gates
        logits = model.apply(variables, jnp.asarray(eval_x),
                             deterministic=True)
        return float(losses.cross_entropy(logits, jnp.asarray(eval_y)))

    jax_eval = eval_loss(state.params)
    jax_ema_eval = eval_loss(state.ema_params)

    # ---- torch oracle, same batches ----
    torch.manual_seed(0)
    oracle = OracleResMoEViT(num_classes=10)
    load_from_flax(oracle, init_params)
    o = train_losses_recipe(oracle, images, targets, lrs, gate_lrs,
                            threshold=THRESHOLD, ema_decay=ema_decay,
                            eval_images=eval_x, eval_labels=eval_y)
    torch_curve = [round(v, 6) for v in o["losses"]]

    return {
        "config": {
            "model": "resmoe_tiny_patch16_224_expert8 (img 32, 10 classes)",
            "recipe": "cmd.sh: RandAugment m9-mstd0.5 + erasing 0.25 + "
                      "mixup 0.8/cutmix 1.0 (smoothing 0.1 in targets) + "
                      "SoftTargetCE + AdamW wd 0.05 + cosine(warmup 5) + "
                      "EMA 0.99996",
            "steps": steps, "steps_per_epoch": steps_per_epoch,
            "epochs": epochs, "base_lr": LR, "gate_lr": GATE_LR,
            "threshold": THRESHOLD, "dtype": "f32",
            "batches": f"{nb}x{batch} raw uint8 seed 17; aug/mixup from the "
                       "on-device pipeline, shared bit-exact (protocol: "
                       "identical float batches to both sides)",
            "aug_batch_stats": {
                "mean": round(float(images.mean()), 5),
                "std": round(float(images.std()), 5),
                "target_max_mean": round(float(targets.max(-1).mean()), 5),
            },
        },
        "reference_torch_oracle_loss": torch_curve,
        "rebuild_jax_loss": jax_curve,
        "final_eval_loss": {"jax": round(jax_eval, 6),
                            "torch": round(o["final_eval_loss"], 6)},
        "final_ema_eval_loss": {"jax": round(jax_ema_eval, 6),
                                "torch": round(o["final_ema_eval_loss"], 6)},
        **_drift(jax_curve, torch_curve),
    }


def main():
    import argparse

    import jax
    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma list of configs to (re)generate "
                         "(resmoe,distilled,capacity,sparse,switchable); default all")
    only = ap.parse_args().only
    known = {"resmoe", "distilled", "capacity", "sparse", "switchable",
             "recipe"}
    todo = set(filter(None, only.split(","))) if only else set(known)
    unknown = todo - known - {"none"}
    if unknown:
        ap.error(f"unknown config(s) {sorted(unknown)}; choose from "
                 f"{sorted(known)} (or 'none' to refresh only the note)")

    note = ("reference cannot execute here (timm + CUDA fmoe missing); the "
            "oracle implements its formulas — see tests/torch_oracle.py. "
            "Divergence beyond ~step 2 in gated/capacity configs is "
            "intrinsic: STE hard gates and capacity slot priority flip "
            "discretely on fp noise (tests/test_golden_torch_parity.py). "
            "The dense distilled config has no discrete mechanism and "
            "tracks tightly the whole way, as do the sparse-search and "
            "switchable-bucket configs (soft masks / affine gathers only).")

    path = "/root/repo/BASELINE.json"
    base = json.load(open(path))
    golden = base.get("golden", {})
    golden["note"] = note

    if "resmoe" in todo:
        print("[resmoe] resmoe_tiny, 200 steps, dropless ragged")
        golden["resmoe_tiny"] = r = _run_resmoe(
            steps=200, dispatch_mode="ragged", capacity_factor=2.0,
            batches=4, batch=16)
        print(f"  drift: step0 {r['step0_rel_diff']:.2e}, "
              f"max {r['max_rel_diff']:.3f}, mean {r['mean_rel_diff']:.3f}")

    if "distilled" in todo:
        print("[distilled] distilled deit, 50 steps, soft KD")
        golden["distilled_deit"] = r = _run_distilled(steps=50)
        print(f"  drift: step0 {r['step0_rel_diff']:.2e}, "
              f"max {r['max_rel_diff']:.3f}, mean {r['mean_rel_diff']:.3f}")

    if "capacity" in todo:
        print("[capacity] resmoe_tiny, 50 steps, capacity_factor 0.5")
        golden["capacity_drop"] = r = _run_resmoe(
            steps=50, dispatch_mode="capacity", capacity_factor=0.5,
            batches=4, batch=16)
        print(f"  drift: step0 {r['step0_rel_diff']:.2e}, "
              f"max {r['max_rel_diff']:.3f}, mean {r['mean_rel_diff']:.3f}")

    if "sparse" in todo:
        print("[sparse] sparse_deit_tiny search, 50 steps, L1 + compress")
        golden["sparse_search"] = r = _run_sparse(steps=50)
        print(f"  drift: step0 {r['step0_rel_diff']:.2e}, "
              f"max {r['max_rel_diff']:.3f}, mean {r['mean_rel_diff']:.3f}; "
              f"mask mismatches {r['compressed_mask_mismatches']}")

    if "switchable" in todo:
        print("[switchable] deit_sw_tiny centroid-bucket training, 50 steps")
        golden["switchable_buckets"] = r = _run_switchable(steps=50)
        print(f"  drift: step0 {r['step0_rel_diff']:.2e}, "
              f"max {r['max_rel_diff']:.3f}, mean {r['mean_rel_diff']:.3f}")

    if "recipe" in todo:
        # 200 steps matches the resmoe golden's convention; the recipe math
        # (aug statistics, soft targets, cosine, EMA trajectory) is fully
        # exercised well before that on this tiny config
        print("[recipe] full cmd.sh recipe math, 200 steps "
              "(aug+mixup shared-batch protocol, cosine, EMA)")
        golden["recipe_full"] = r = _run_recipe(steps=200)
        print(f"  drift: step0 {r['step0_rel_diff']:.2e}, "
              f"max {r['max_rel_diff']:.3f}, mean {r['mean_rel_diff']:.3f}; "
              f"eval jax/torch {r['final_eval_loss']}, "
              f"ema {r['final_ema_eval_loss']}")

    base["golden"] = golden
    json.dump(base, open(path, "w"), indent=1)
    print(f"\nwrote golden curves to {path}")


if __name__ == "__main__":
    main()
