"""Isolated optimizer-step bench: optax chain vs fused Pallas AdamW+EMA."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, "/root/repo")
from slim_switch_moe_vit_tpu import optim

K = 50


def main():
    rs = np.random.RandomState(0)
    # realistic flagship-scale tree: 12 x (8,384,1536)+(8,1536,384) expert
    # weights + some dense leaves ~= 118M params
    params = {}
    for i in range(12):
        params[f"b{i}"] = {
            "expert_fc1_kernel": jnp.asarray(rs.randn(8, 384, 1536) * .02, jnp.float32),
            "expert_fc2_kernel": jnp.asarray(rs.randn(8, 1536, 384) * .02, jnp.float32),
            "qkv_kernel": jnp.asarray(rs.randn(384, 1152) * .02, jnp.float32),
            "proj_kernel": jnp.asarray(rs.randn(384, 384) * .02, jnp.float32),
        }
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n/1e6:.1f}M")

    opt_init, update = optim.make_optimizer(params, weight_decay=0.05)
    grads = jax.tree.map(lambda p: p * 0.01, params)
    lr = jnp.float32(1e-3)
    decay = 0.99996

    def run_optax(params, s, ema, grads):
        def body(c, _):
            p, s, e = c
            upd, s = update(grads, s, p, lr, lr)
            p = optax.apply_updates(p, upd)
            e = jax.tree.map(lambda a, b: a * decay + b * (1 - decay), e, p)
            return (p, s, e), jnp.float32(0)
        (p, s, e), _ = jax.lax.scan(body, (params, s, ema), None, length=K)
        return jax.tree.leaves(p)[0].ravel()[0]

    def run_fused(params, s, ema, grads):
        def body(c, _):
            p, s, e = c
            p, s, e = update.fused_apply(p, grads, s, e, lr, lr, decay)
            return (p, s, e), jnp.float32(0)
        (p, s, e), _ = jax.lax.scan(body, (params, s, ema), None, length=K)
        return jax.tree.leaves(p)[0].ravel()[0]

    for name, fn in (("optax", run_optax), ("fused", run_fused)):
        s = opt_init(params)
        ema = jax.tree.map(jnp.copy, params)
        f = jax.jit(fn, donate_argnums=(0, 1, 2))
        _ = float(f(jax.tree.map(jnp.copy, params), s, ema, grads))
        s = opt_init(params)
        ema = jax.tree.map(jnp.copy, params)
        t0 = time.perf_counter()
        _ = float(f(jax.tree.map(jnp.copy, params), s, ema, grads))
        dt = (time.perf_counter() - t0) / K * 1000
        gb = n * 4 * 9 / 1e9
        print(f"{name:6s} {dt:7.3f} ms/step   ({gb / (dt/1000):.0f} GB/s "
              f"effective at 9 passes)")


if __name__ == "__main__":
    main()
