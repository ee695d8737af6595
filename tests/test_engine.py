"""Engine tests: losses vs torch-free oracles, optimizer parity, train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slim_switch_moe_vit_tpu import losses as L
from slim_switch_moe_vit_tpu import optim
from slim_switch_moe_vit_tpu.engine import (
    evaluate, make_eval_step, make_train_step, train_one_epoch,
)
from slim_switch_moe_vit_tpu.models import create_model
from slim_switch_moe_vit_tpu.train_state import create_train_state, param_count


def test_cross_entropy_matches_manual():
    logits = jnp.array([[2.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
    labels = jnp.array([0, 2])
    got = float(L.cross_entropy(logits, labels))
    p = np.exp(np.asarray(logits))
    p /= p.sum(-1, keepdims=True)
    want = -(np.log(p[0, 0]) + np.log(p[1, 2])) / 2
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_label_smoothing_reduces_to_ce_at_zero():
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 7))
    labels = jnp.array([0, 1, 2, 3])
    np.testing.assert_allclose(
        float(L.label_smoothing_cross_entropy(logits, labels, 0.0)),
        float(L.cross_entropy(logits, labels)), rtol=1e-6)


def test_soft_target_ce_matches_hard_onehot():
    logits = jax.random.normal(jax.random.PRNGKey(1), (4, 7))
    labels = jnp.array([0, 1, 2, 3])
    soft = jax.nn.one_hot(labels, 7)
    np.testing.assert_allclose(
        float(L.soft_target_cross_entropy(logits, soft)),
        float(L.cross_entropy(logits, labels)), rtol=1e-6)


def test_bce_matches_torch_formula():
    import torch

    logits = np.random.RandomState(0).randn(4, 7).astype(np.float32)
    target = (np.random.RandomState(1).rand(4, 7) > 0.5).astype(np.float32)
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(target)).item()
    got = float(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_distillation_soft_matches_torch():
    import torch
    import torch.nn.functional as F

    rs = np.random.RandomState(2)
    s = rs.randn(4, 7).astype(np.float32)
    t = rs.randn(4, 7).astype(np.float32)
    T = 2.0
    want = (F.kl_div(
        F.log_softmax(torch.tensor(s) / T, dim=1),
        F.log_softmax(torch.tensor(t) / T, dim=1),
        reduction="sum", log_target=True,
    ) * (T * T) / s.size).item()
    got = float(L.distillation_loss(
        jnp.asarray(0.0), jnp.asarray(s), jnp.asarray(t), "soft", 1.0, T))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_accuracy_topk():
    logits = jnp.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = jnp.array([1, 2])
    acc1, acc5 = L.accuracy_topk(logits, labels)
    assert float(acc1) == 50.0
    assert float(acc5) == 100.0  # k capped at num classes


def test_wd_mask_and_gate_mask():
    model = create_model("resmoe_tiny_patch16_224_expert8", num_classes=10,
                         img_size=32)
    state = create_train_state(model, (1, 32, 32, 3))
    mask = optim.wd_mask(state.params)
    gmask = optim.gate_mask(state.params)
    flat_m = jax.tree_util.tree_flatten_with_path(mask)[0]
    flat_g = jax.tree_util.tree_flatten_with_path(gmask)[0]
    # pos_embed / cls_token excluded from decay
    for path, v in flat_m:
        names = [str(getattr(k, "key", k)) for k in path]
        if "pos_embed" in names or "cls_token" in names:
            assert v is False or v == False  # noqa: E712
        if "bias" in names[-1]:
            assert not v
    assert any(v for _, v in flat_g), "gate params must be labeled"
    n_gate = sum(1 for _, v in flat_g if v)
    assert n_gate == 12 * 2 * 2  # 12 blocks x 2 gates x (kernel, bias)


def test_cosine_schedule_shape():
    sched = optim.TimmCosineSchedule(1e-3, epochs=100, warmup_epochs=5,
                                     warmup_lr=1e-6, min_lr=1e-5)
    assert abs(sched(0) - 1e-6) < 1e-9
    assert sched(5) == pytest.approx(
        1e-5 + 0.5 * (1e-3 - 1e-5) * (1 + np.cos(np.pi * 5 / 100)))
    assert sched(99) < sched(50) < sched(5)
    assert sched(100) == 1e-5  # cooldown floor


def _tiny_setup(model_name="deit_tiny_patch16_224", **mkw):
    model = create_model(model_name, num_classes=5, img_size=32, **mkw)
    opt_init, opt_update = optim.make_optimizer(
        create_train_state(model, (1, 32, 32, 3)).params,
        weight_decay=0.05, clip_grad=1.0)
    state = create_train_state(model, (1, 32, 32, 3), opt_init=opt_init,
                               use_ema=True)
    return model, state, opt_update


def test_train_step_reduces_loss():
    model, state, opt_update = _tiny_setup()
    crit = L.make_base_criterion(False, 0.1, False)
    step = make_train_step(model, opt_update, crit, ema_decay=0.9)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    y = jnp.array([0, 1, 2, 3, 4, 0, 1, 2])
    losses = []
    for _ in range(10):
        state, metrics = step(state, x, y, jnp.float32(1e-3), jnp.float32(1e-3))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 10
    # EMA moved but differs from params
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                        state.params, state.ema_params)
    assert sum(jax.tree.leaves(diff)) > 0


def test_train_step_resmoe_with_gates_and_mixup():
    from slim_switch_moe_vit_tpu.data.mixup import make_mixup_fn

    model, state, opt_update = _tiny_setup("resmoe_tiny_patch16_224_expert8")
    crit = L.make_base_criterion(True, 0.1, False)  # mixup -> soft target CE
    mixup = make_mixup_fn(num_classes=5, label_smoothing=0.1)
    step = make_train_step(model, opt_update, crit, mixup_fn=mixup,
                           moe_balance_weight=0.01)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    y = jnp.array([0, 1, 2, 3, 4, 0, 1, 2])
    state, metrics = step(state, x, y, jnp.float32(1e-3), jnp.float32(1e-3))
    assert np.isfinite(float(metrics["loss"]))
    assert "balance_loss" in metrics and "skip_fraction" in metrics


def test_eval_and_epoch_loops():
    model, state, opt_update = _tiny_setup()
    crit = L.make_base_criterion(False, 0.1, False)
    step = make_train_step(model, opt_update, crit)
    eval_step = make_eval_step(model)
    rs = np.random.RandomState(0)
    batches = [(rs.randn(4, 32, 32, 3).astype(np.float32),
                rs.randint(0, 5, 4)) for _ in range(3)]
    state, stats = train_one_epoch(state, step, iter(batches), epoch=0,
                                   lr_base=1e-3, lr_gate=1e-3)
    assert "loss" in stats
    test_stats = evaluate(state, eval_step, iter(batches))
    assert set(test_stats) >= {"loss", "acc1", "acc5"}


def test_distilled_train_step():
    model, state, opt_update = _tiny_setup("deit_tiny_distilled_patch16_224")
    crit = L.make_base_criterion(False, 0.1, False)
    # teacher = frozen copy of the model itself (eval head-average output)
    teacher_vars = {"params": state.params}
    model_eval = model

    def teacher_apply(images):
        return model_eval.apply(teacher_vars, images, deterministic=True)

    step = make_train_step(model, opt_update, crit, distillation_type="hard",
                           alpha=0.5, tau=1.0, teacher_apply=teacher_apply)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    y = jnp.array([0, 1, 2, 3])
    state, metrics = step(state, x, y, jnp.float32(1e-3), jnp.float32(1e-3))
    assert np.isfinite(float(metrics["loss"]))
