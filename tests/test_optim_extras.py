"""attn-only freezing, lr noise, train-mode, distributed helpers."""
import jax
import jax.numpy as jnp
import numpy as np

from slim_switch_moe_vit_tpu import losses, optim
from slim_switch_moe_vit_tpu.engine import make_train_step
from slim_switch_moe_vit_tpu.models import create_model
from slim_switch_moe_vit_tpu.train_state import create_train_state


def test_attn_only_mask_freezes_right_params():
    model = create_model("deit_tiny_patch16_224", num_classes=5, img_size=32)
    state = create_train_state(model, (1, 32, 32, 3))
    mask = optim.attn_only_mask(state.params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    by_name = {tuple(str(getattr(k, "key", k)) for k in p): v for p, v in flat}
    assert by_name[("blocks_0", "attn", "qkv", "kernel")] is True
    assert by_name[("blocks_0", "mlp", "fc1", "kernel")] is False
    assert by_name[("blocks_0", "norm1", "scale")] is False
    assert by_name[("head", "kernel")] is True
    assert by_name[("pos_embed",)] is True
    assert by_name[("patch_embed", "proj", "kernel")] is False
    assert by_name[("cls_token",)] is False


def test_attn_only_training_only_updates_attn():
    model = create_model("deit_tiny_patch16_224", num_classes=5, img_size=32)
    probe = create_train_state(model, (1, 32, 32, 3))
    oi, ou = optim.make_optimizer(probe.params, weight_decay=0.05,
                                  trainable_mask=optim.attn_only_mask)
    state = create_train_state(model, (1, 32, 32, 3), opt_init=oi)
    crit = losses.make_base_criterion(False, 0.1, False)
    step = make_train_step(model, ou, crit, donate=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    y = jnp.array([0, 1, 2, 3])
    new_state, _ = step(state, x, y, jnp.float32(1e-2), jnp.float32(1e-2))
    p0, p1 = state.params, new_state.params
    moved = float(jnp.abs(
        p1["blocks_0"]["attn"]["qkv"]["kernel"]
        - p0["blocks_0"]["attn"]["qkv"]["kernel"]).sum())
    frozen = float(jnp.abs(
        p1["blocks_0"]["mlp"]["fc1"]["kernel"]
        - p0["blocks_0"]["mlp"]["fc1"]["kernel"]).sum())
    assert moved > 0 and frozen == 0.0


def test_lr_noise_applied_in_range():
    s = optim.TimmCosineSchedule(1e-3, 100, warmup_epochs=0,
                                 noise_range=[0.5], noise_pct=0.67)
    base = optim.TimmCosineSchedule(1e-3, 100, warmup_epochs=0)
    assert s(10) == base(10)  # before noise range
    assert s(60) != base(60)  # inside range
    assert abs(s(60) / base(60) - 1.0) < 0.67


def test_train_mode_false_is_deterministic():
    model = create_model("deit_tiny_patch16_224", num_classes=5, img_size=32,
                         drop_path_rate=0.5)
    probe = create_train_state(model, (1, 32, 32, 3))
    oi, ou = optim.make_optimizer(probe.params)
    state = create_train_state(model, (1, 32, 32, 3), opt_init=oi)
    crit = losses.make_base_criterion(False, 0.1, False)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    y = jnp.array([0, 1, 2, 3])
    step_det = make_train_step(model, ou, crit, set_training_mode=False,
                               donate=False)
    _, m1 = step_det(state, x, y, jnp.float32(0.0), jnp.float32(0.0))
    _, m2 = step_det(state, x, y, jnp.float32(0.0), jnp.float32(0.0))
    # droppath off + lr 0 -> identical losses across rng states
    assert float(m1["loss"]) == float(m2["loss"])


def test_distributed_helpers_single_host():
    from slim_switch_moe_vit_tpu.parallel import distributed as D

    assert D.get_world_size() == 1
    assert D.get_rank() == 0
    assert D.is_main_process()
    out = []
    D.save_on_master(lambda v: out.append(v), 42)
    assert out == [42]
