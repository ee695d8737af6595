"""Golden-baseline parity: the JAX framework vs the torch oracle.

The reference cannot run here (needs timm + CUDA fmoe), so the "reference
curve" is established by tests/torch_oracle.py — a from-formulas torch
implementation of the reference's ResMoE training math. Both sides start
from IDENTICAL weights (transferred) and see IDENTICAL batches; their loss
trajectories over real AdamW steps must track each other. This is the
strongest CPU-scale evidence that training dynamics match the reference
semantics (scripts/golden_baseline.py records the longer golden curve).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import (  # noqa: E402
    OracleResMoEViT, OracleViT, load_from_flax, load_from_flax_vit,
    train_losses, train_losses_distilled,
)

STEPS = 8
LR, GATE_LR = 1e-3, 5e-4
THRESHOLD = 0.5


def perturb_router_bias(params, scale=0.02, seed=3):
    """Give every MoE router bias a small shared random value. At the exact
    init (zero bias) the gate-zeroed rows have ALL-ZERO router logits, and
    top-k tie-breaking on full ties is implementation-defined (jax picks
    experts [0,1], torch.topk picks others) — under a finite capacity those
    rows then consume DIFFERENT experts' slots and drop different real
    tokens. Ties are measure-zero from step 1 on; both sides receive this
    same perturbed bias via the weight transfer."""
    import jax

    rs = np.random.RandomState(seed)

    def bump(path, leaf):
        if any(getattr(p, "key", None) == "router_bias" for p in path):
            return leaf + rs.normal(0, scale, leaf.shape).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(bump, params)


def _jax_losses(params_out, dispatch_mode="ragged", capacity_factor=2.0,
                steps=STEPS, bump_router_bias=False):
    from slim_switch_moe_vit_tpu import create_model, losses, optim
    from slim_switch_moe_vit_tpu.engine import make_train_step
    from slim_switch_moe_vit_tpu.train_state import create_train_state

    model = create_model(
        "resmoe_tiny_patch16_224_expert8", num_classes=10, img_size=32,
        dispatch_mode=dispatch_mode, capacity_factor=capacity_factor,
        starting_threshold=THRESHOLD,
        target_threshold=THRESHOLD,
    )
    probe = create_train_state(model, (1, 32, 32, 3))
    opt_init, opt_update = optim.make_optimizer(probe.params,
                                                weight_decay=0.05)
    state = create_train_state(model, (1, 32, 32, 3), opt_init=opt_init)
    if bump_router_bias:
        state = state.replace(params=perturb_router_bias(state.params))
    params_out.append(jax.tree.map(np.asarray, state.params))

    crit = losses.make_base_criterion(False, 0.1, False)
    step = make_train_step(model, opt_update, crit, donate=False)

    rs = np.random.RandomState(7)
    images = rs.randn(2, 8, 32, 32, 3).astype(np.float32)
    labels = rs.randint(0, 10, (2, 8))

    out = []
    for s in range(steps):
        state, metrics = step(
            state, jnp.asarray(images[s % 2]), jnp.asarray(labels[s % 2]),
            jnp.float32(LR), jnp.float32(GATE_LR))
        out.append(float(metrics["loss"]))
    return out, images, labels


def test_jax_matches_torch_oracle_loss_curve():
    params_box = []
    jax_losses, images, labels = _jax_losses(params_box)

    torch.manual_seed(0)
    oracle = OracleResMoEViT(num_classes=10)
    load_from_flax(oracle, params_box[0])
    torch_curve = train_losses(oracle, images, labels, STEPS, LR, GATE_LR,
                               threshold=THRESHOLD)

    # identical math, independent implementations: step-0 losses agree to
    # float noise (measured 1e-7 rel) and step 1 to ~3e-5. From step 2 the
    # STE gates make divergence intrinsic: a single fp-noise flip of
    # (prob > threshold) changes which tokens skip, a DISCRETE change —
    # measured drift is 0.6-3.2% while the curves track closely.
    np.testing.assert_allclose(jax_losses[0], torch_curve[0], rtol=2e-4)
    np.testing.assert_allclose(jax_losses[1], torch_curve[1], rtol=2e-3)
    for s in range(2, STEPS):
        np.testing.assert_allclose(
            jax_losses[s], torch_curve[s], rtol=6e-2,
            err_msg=f"loss diverged at step {s}: jax={jax_losses}, "
                    f"torch={torch_curve}")
    # and both trajectories actually learn
    assert jax_losses[-1] < jax_losses[0] and torch_curve[-1] < torch_curve[0]


def test_capacity_dropping_matches_torch_oracle():
    """Golden config 3 (VERDICT r2 #5c): finite capacity_factor so pairs
    really drop on BOTH sides (token-major slot priority, ops/moe.py:96-117),
    and the training curves still track."""
    from slim_switch_moe_vit_tpu.ops.moe import compute_capacity

    # B=8 x N=5 tokens -> T=40 pairs-of-2; cf=0.5 gives capacity 8 < the
    # 10-pair/expert average, so drops are guaranteed
    cap = compute_capacity(40, 8, 2, 0.5)
    assert cap < 40 * 2 / 8 * 2  # sanity: finite enough to drop

    params_box = []
    steps = 6
    jax_losses, images, labels = _jax_losses(
        params_box, dispatch_mode="capacity", capacity_factor=0.5,
        steps=steps, bump_router_bias=True)

    torch.manual_seed(0)
    oracle = OracleResMoEViT(num_classes=10, capacity=cap)
    load_from_flax(oracle, params_box[0])
    torch_curve = train_losses(oracle, images, labels, steps, LR, GATE_LR,
                               threshold=THRESHOLD)

    np.testing.assert_allclose(jax_losses[0], torch_curve[0], rtol=2e-4)
    for s in range(1, steps):
        # capacity ranking adds a second discrete mechanism (slot priority
        # flips on router fp noise) on top of the STE gates
        np.testing.assert_allclose(
            jax_losses[s], torch_curve[s], rtol=8e-2,
            err_msg=f"capacity curve diverged at step {s}: "
                    f"jax={jax_losses}, torch={torch_curve}")


def test_distilled_deit_matches_torch_oracle():
    """Golden config 2 (VERDICT r2 #5b): distilled deit — dual heads + soft
    KD loss vs a frozen teacher (reference losses.py:53-72, model.py:32-77)."""
    from slim_switch_moe_vit_tpu import create_model, losses, optim
    from slim_switch_moe_vit_tpu.engine import make_train_step
    from slim_switch_moe_vit_tpu.train_state import create_train_state

    steps = 6
    alpha, tau = 0.5, 3.0

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
    images = rs.randn(2, 8, 32, 32, 3).astype(np.float32)
    labels = rs.randint(0, 10, (2, 8))

    jax_losses = []
    for s in range(steps):
        state, metrics = step(
            state, jnp.asarray(images[s % 2]), jnp.asarray(labels[s % 2]),
            jnp.float32(LR), jnp.float32(LR))
        jax_losses.append(float(metrics["loss"]))

    torch.manual_seed(0)
    o_student = OracleViT(num_classes=10, distilled=True)
    o_teacher = OracleViT(num_classes=10, distilled=False)
    load_from_flax_vit(o_student, init_params)
    load_from_flax_vit(o_teacher, teacher_params)
    torch_curve = train_losses_distilled(o_student, o_teacher, images, labels,
                                         steps, LR, alpha, tau)

    # fully dense + deterministic: no STE discreteness, so the whole curve
    # must track tightly (fp accumulation-order noise only)
    for s in range(steps):
        np.testing.assert_allclose(
            jax_losses[s], torch_curve[s], rtol=5e-3,
            err_msg=f"distilled curve diverged at step {s}: "
                    f"jax={jax_losses}, torch={torch_curve}")
    assert jax_losses[-1] < jax_losses[0]
