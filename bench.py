"""Benchmark harness — prints ONE JSON line for the driver.

Measures training throughput (images/sec/chip) of the flagship model
(ResMoE-tiny: token-skip gates + 8-expert top-2 Switch MoE in every block,
224x224, bf16) with the full train step (forward+backward+AdamW+EMA).

Measurement notes (this environment's axon TPU tunnel):
- ``block_until_ready`` does not reliably wait — only a value fetch forces
  execution. The bench therefore runs K steps inside ONE jitted ``lax.scan``
  and fetches the final loss, so the measurement covers real device time with
  a single ~25ms tunnel round-trip amortized over K steps.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
ratio is vs the north-star target from BASELINE.json — 90% of the analytic
roofline images/sec for this model at v5e bf16 peak (197 TFLOP/s), with
fwd+bwd+update costed by XLA's own cost analysis. vs_baseline >= 1.0 means
the north star is met.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from slim_switch_moe_vit_tpu import create_model, losses, optim
    from slim_switch_moe_vit_tpu.engine import make_train_step
    from slim_switch_moe_vit_tpu.train_state import create_train_state

    batch = 128
    img = 224
    K = 10  # steps per timed call
    # north-star config (BASELINE.json): ViT-S/16 Switch-8E
    model = create_model(
        "moe_small_patch16_224_expert8", num_classes=1000, img_size=img,
        dtype=jnp.bfloat16,
    )
    probe = create_train_state(model, (1, img, img, 3))
    opt_init, opt_update = optim.make_optimizer(probe.params,
                                                weight_decay=0.05)
    state = create_train_state(model, (1, img, img, 3), opt_init=opt_init,
                               use_ema=True)
    crit = losses.make_base_criterion(False, 0.1, False)
    step = make_train_step(model, opt_update, crit, ema_decay=0.99996,
                           donate=False)
    inner = getattr(step, "__wrapped__", step)

    x = jnp.asarray(np.random.RandomState(0).randn(batch, img, img, 3),
                    jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randint(0, 1000, batch))
    lr = jnp.float32(1e-3)

    @jax.jit
    def k_steps(state):
        def body(s, _):
            s, metrics = inner(s, x, y, lr, lr)
            return s, metrics["loss"]

        state, losses_ = jax.lax.scan(body, state, None, length=K)
        return state, losses_[-1]

    # warmup/compile (value fetch forces real execution)
    state, loss = k_steps(state)
    _ = float(loss)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, loss = k_steps(state)
        _ = float(loss)  # forces the chain
        times.append(time.perf_counter() - t0)
    dt = min(times)

    ips = batch * K / dt

    # roofline target from the analytic model FLOPs (XLA cost_analysis counts
    # the scan body inconsistently across backends); train ~= 3x forward
    from slim_switch_moe_vit_tpu.ops.flops import vit_flops

    fwd_per_image = vit_flops(1, img, 16, 384, 12, 4.0, 1000, moe=True,
                              num_experts=8, top_k=2)
    peak = 197e12  # v5e bf16
    roofline_ips = peak / (3 * fwd_per_image)
    target = 0.9 * roofline_ips

    print(json.dumps({
        "metric": "train_images_per_sec_per_chip_vit_s16_switch8e_224_bf16_b128",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / target, 4),
    }))


if __name__ == "__main__":
    main()
