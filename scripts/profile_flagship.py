"""Profile the flagship train step on the real chip; print per-op table.

Usage: python scripts/profile_flagship.py [model] [batch] [K]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from slim_switch_moe_vit_tpu import create_model, losses, optim
    from slim_switch_moe_vit_tpu.engine import make_train_step
    from slim_switch_moe_vit_tpu.train_state import create_train_state
    from slim_switch_moe_vit_tpu.utils.profiling import trace, summarize_trace

    name = sys.argv[1] if len(sys.argv) > 1 else "moe_small_patch16_224_expert8"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    img = 224

    model = create_model(name, num_classes=1000, img_size=img,
                         dtype=jnp.bfloat16)
    probe = create_train_state(model, (1, img, img, 3))
    opt_init, opt_update = optim.make_optimizer(probe.params, weight_decay=0.05)
    state = create_train_state(model, (1, img, img, 3), opt_init=opt_init,
                               use_ema=True)
    crit = losses.make_base_criterion(False, 0.1, False)
    import os

    step = make_train_step(
        model, opt_update, crit, ema_decay=0.99996, donate=False,
        use_fused_optimizer=bool(int(os.environ.get("FUSED_OPT", "0"))))
    inner = getattr(step, "__wrapped__", step)

    x = jnp.asarray(np.random.RandomState(0).randn(batch, img, img, 3),
                    jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randint(0, 1000, batch))
    lr = jnp.float32(1e-3)

    @jax.jit
    def k_steps(state):
        def body(s, _):
            s, m = inner(s, x, y, lr, lr)
            return s, m["loss"]
        state, losses_ = jax.lax.scan(body, state, None, length=K)
        return state, losses_[-1]

    state, loss = k_steps(state)
    print("warm loss:", float(loss))

    t0 = time.perf_counter()
    state, loss = k_steps(state)
    _ = float(loss)
    dt = time.perf_counter() - t0
    print(f"{batch * K / dt:.1f} img/s  ({dt / K * 1000:.2f} ms/step)")

    log_dir = "/tmp/flagship_trace"
    with trace(log_dir):
        state, loss = k_steps(state)
        _ = float(loss)
    rows = summarize_trace(log_dir, top=30, steps=K)
    print(f"{'ms/step':>9}  {'count':>6}  op")
    for ms, cnt, label in rows:
        print(f"{ms:9.3f}  {cnt:6d}  {label[:110]}")


if __name__ == "__main__":
    main()
