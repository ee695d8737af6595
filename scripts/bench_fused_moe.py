"""Real-chip check of the fused expert FFN: parity vs ragged + fwd/bwd timing."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from slim_switch_moe_vit_tpu.ops import moe as moe_ops

K = 100
T, d, h, E, k = 25216, 384, 1536, 8, 2


def timed(name, loss_fn, args):
    g = jax.jit(jax.grad(loss_fn))

    @jax.jit
    def run(x):
        def body(c, _):
            dx = g(c, *args[1:])
            return c + dx * jnp.asarray(1e-6, c.dtype), dx.ravel()[0]
        c, outs = jax.lax.scan(body, x, None, length=K)
        return outs[-1]

    _ = float(run(args[0]))
    t0 = time.perf_counter()
    _ = float(run(args[0]))
    dt = (time.perf_counter() - t0) / K * 1000
    print(f"{name:10s} fwd+bwd {dt:8.3f} ms/block")
    return dt


def main():
    rs = np.random.RandomState(0)
    router_w = jnp.asarray(rs.randn(d, E) * 0.1, jnp.float32)
    router_b = jnp.asarray(rs.randn(E) * 0.01, jnp.float32)
    w1 = jnp.asarray(rs.randn(E, d, h) * 0.05, jnp.float32)
    b1 = jnp.asarray(rs.randn(E, h) * 0.01, jnp.float32)
    w2 = jnp.asarray(rs.randn(E, h, d) * 0.05, jnp.float32)
    b2 = jnp.asarray(rs.randn(E, d) * 0.01, jnp.float32)
    x32 = jnp.asarray(rs.randn(T, d) * 0.5, jnp.float32)
    x = x32.astype(jnp.bfloat16)

    # correctness on-chip (bf16): fused vs ragged
    yf, _ = jax.jit(lambda x: moe_ops.moe_forward_fused(
        x, router_w, router_b, w1, b1, w2, b2, top_k=k))(x)
    yr, _ = jax.jit(lambda x: moe_ops.moe_forward_ragged(
        x, router_w, router_b, w1, b1, w2, b2, top_k=k))(x)
    err = float(jnp.max(jnp.abs(yf.astype(jnp.float32) -
                                yr.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(yr.astype(jnp.float32))))
    print(f"max|fused-ragged| = {err:.4e}  (rel {rel:.2e})")

    def loss_fused(x, *p):
        y, _ = moe_ops.moe_forward_fused(x, *p, top_k=k)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_ragged(x, *p):
        y, _ = moe_ops.moe_forward_ragged(x, *p, top_k=k)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    args = (x, router_w, router_b, w1, b1, w2, b2)
    t_r = timed("ragged", loss_ragged, args)
    t_f = timed("fused", loss_fused, args)
    print(f"speedup {t_r / t_f:.2f}x  (saves {(t_r - t_f) * 12:.1f} ms/step "
          f"over 12 blocks)")


if __name__ == "__main__":
    main()
