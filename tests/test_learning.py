"""End-to-end learning sanity: the full train step must be able to overfit."""
import jax
import jax.numpy as jnp
import numpy as np

from slim_switch_moe_vit_tpu import losses, optim
from slim_switch_moe_vit_tpu.engine import make_train_step
from slim_switch_moe_vit_tpu.models.vit import VisionTransformer
from slim_switch_moe_vit_tpu.train_state import create_train_state


def test_train_step_overfits_single_batch():
    model = VisionTransformer(img_size=16, patch_size=4, num_classes=4,
                              embed_dim=64, depth=2, num_heads=2)
    probe = create_train_state(model, (1, 16, 16, 3))
    oi, ou = optim.make_optimizer(probe.params, weight_decay=0.0)
    state = create_train_state(model, (1, 16, 16, 3), opt_init=oi)
    crit = losses.make_base_criterion(False, 0.0, False)
    step = make_train_step(model, ou, crit, donate=False)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(8, 16, 16, 3), jnp.float32)
    y = jnp.asarray(rs.randint(0, 4, 8))
    lr = jnp.float32(1e-3)
    first = None
    for i in range(200):
        state, m = step(state, x, y, lr, lr)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < 0.05 < first
    logits = model.apply({"params": state.params}, x, deterministic=True)
    assert float((jnp.argmax(logits, -1) == y).mean()) == 1.0
