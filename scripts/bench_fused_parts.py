"""Break down the fused MoE block cost: routing+layout vs gather vs kernels."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from slim_switch_moe_vit_tpu.ops import moe as moe_ops
from slim_switch_moe_vit_tpu.ops.fused_ffn import fused_expert_ffn

K = 100
T, d, h, E, k = 25216, 384, 1536, 8, 2


def timed(name, fn, *args, grad_of=None):
    if grad_of is not None:
        fn = jax.grad(fn, argnums=grad_of)

    @jax.jit
    def run(a0, rest):
        def body(c, _):
            out = fn(c, *rest)
            leaf = jax.tree.leaves(out)[0]
            return c + jnp.asarray(leaf.ravel()[0], c.dtype) * jnp.asarray(1e-12, c.dtype), leaf.ravel()[0]
        c, outs = jax.lax.scan(body, a0, None, length=K)
        return outs[-1]

    _ = float(run(args[0], args[1:]))
    t0 = time.perf_counter()
    _ = float(run(args[0], args[1:]))
    dt = (time.perf_counter() - t0) / K * 1000
    print(f"{name:34s} {dt:8.3f} ms")
    return dt


def main():
    rs = np.random.RandomState(0)
    router_w = jnp.asarray(rs.randn(d, E) * 0.1, jnp.float32)
    router_b = jnp.asarray(rs.randn(E) * 0.01, jnp.float32)
    w1 = jnp.asarray(rs.randn(E, d, h) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rs.randn(E, h) * 0.01, jnp.float32)
    w2 = jnp.asarray(rs.randn(E, h, d) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rs.randn(E, d) * 0.01, jnp.float32)
    x = jnp.asarray(rs.randn(T, d) * 0.5, jnp.bfloat16)

    # routing + layout only
    def routing(x):
        logits = jnp.dot(x.astype(jnp.float32), router_w) + router_b
        gate_w, eidx = moe_ops.naive_topk_gate(logits, k)
        gi, ps, et, _, _ = moe_ops.aligned_expert_layout(eidx, E)
        return gi.astype(jnp.float32).sum() + ps.astype(jnp.float32).sum() + gate_w.sum()

    timed("routing+layout (fwd)", routing, x)

    # fixed layout for isolation
    eidx = jnp.asarray(rs.randint(0, E, (T, k)), jnp.int32)
    gi, ps, et, _, _ = jax.jit(lambda e: moe_ops.aligned_expert_layout(e, E))(eidx)
    gate_w = jnp.asarray(rs.rand(T, k), jnp.float32)

    def gather_only(x):
        xs = jnp.take(x, gi, axis=0)
        return xs.astype(jnp.float32).sum()

    timed("xs gather fwd", gather_only, x)
    timed("xs gather fwd+bwd", gather_only, x, grad_of=0)

    def kernels_only(x):
        xs = jnp.take(x, gi, axis=0)
        out = fused_expert_ffn(xs, w1, b1, w2, b2, et)
        return out.astype(jnp.float32).sum()

    timed("gather+kernel fwd", kernels_only, x)
    timed("gather+kernel fwd+bwd", kernels_only, x, grad_of=0)

    def with_combine(x):
        xs = jnp.take(x, gi, axis=0)
        out = fused_expert_ffn(xs, w1, b1, w2, b2, et)
        y = jnp.zeros((T, d), out.dtype)
        for kk in range(k):
            y = y + jnp.take(out, ps[:, kk], axis=0) * gate_w[:, kk:kk+1].astype(out.dtype)
        return y.astype(jnp.float32).sum()

    timed("gather+kernel+combine fwd", with_combine, x)
    timed("gather+kernel+combine fwd+bwd", with_combine, x, grad_of=0)


if __name__ == "__main__":
    main()
