"""Second-pass microbench: fc1+fc2 chains, reduction-epilogue variant, gmm.

Distinguishes 'output-write bound' from 'compute bound' and measures the
realistic fc1->gelu->fc2 chain per strategy.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 200
T2, D, H, E = 50432, 384, 1536, 8
C = T2 // E
FL = 2 * T2 * D * H * 2  # fc1+fc2


def timed(name, make_body, flops):
    @jax.jit
    def run(x):
        def body(c, _):
            x = c
            out_scalar, x2 = make_body(x)
            return x2, out_scalar
        c, outs = jax.lax.scan(body, x, None, length=K)
        return outs[-1]

    x0 = jnp.asarray(np.random.RandomState(0).randn(T2, D), jnp.bfloat16)
    _ = float(run(x0))
    t0 = time.perf_counter()
    _ = float(run(x0))
    dt = (time.perf_counter() - t0) / K * 1000
    print(f"{name:22s} {dt:8.3f} ms   {flops / dt / 1e9:9.1f} GFLOP/s-eff")
    return dt


def main():
    rs = np.random.RandomState(1)
    w1 = jnp.asarray(rs.randn(D, H) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rs.randn(H, D) * 0.05, jnp.bfloat16)
    w1e = jnp.broadcast_to(w1, (E, D, H)).copy()
    w2e = jnp.broadcast_to(w2, (E, H, D)).copy()
    gs = jnp.full((E,), C, jnp.int32)

    def dense_chain(x):
        h = jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)
        h = jax.nn.gelu(h, approximate=False)
        y = jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)
        return y.ravel()[0].astype(jnp.float32), x + y * jnp.bfloat16(1e-3)

    def einsum_chain(x):
        xb = x.reshape(E, C, D)
        h = jnp.einsum("ecd,edh->ech", xb, w1e, preferred_element_type=jnp.bfloat16)
        h = jax.nn.gelu(h, approximate=False)
        y = jnp.einsum("ech,ehd->ecd", h, w2e, preferred_element_type=jnp.bfloat16)
        y = y.reshape(T2, D)
        return y.ravel()[0].astype(jnp.float32), x + y * jnp.bfloat16(1e-3)

    def ragged_chain(x):
        h = jax.lax.ragged_dot(x, w1e, gs, preferred_element_type=jnp.bfloat16)
        h = jax.nn.gelu(h, approximate=False)
        y = jax.lax.ragged_dot(h, w2e, gs, preferred_element_type=jnp.bfloat16)
        return y.ravel()[0].astype(jnp.float32), x + y * jnp.bfloat16(1e-3)

    timed("dense fc1+gelu+fc2", dense_chain, FL)
    timed("einsum fc1+gelu+fc2", einsum_chain, FL)
    timed("ragged fc1+gelu+fc2", ragged_chain, FL)

    try:
        from jax.experimental.pallas.ops.tpu.megablox.gmm import gmm

        def gmm_chain(x):
            h = gmm(x, w1e, gs, preferred_element_type=jnp.bfloat16)
            h = jax.nn.gelu(h, approximate=False)
            y = gmm(h, w2e, gs, preferred_element_type=jnp.bfloat16)
            return y.ravel()[0].astype(jnp.float32), x + y * jnp.bfloat16(1e-3)

        timed("gmm fc1+gelu+fc2", gmm_chain, FL)
    except Exception as e:
        print("gmm failed:", type(e).__name__, str(e)[:300])

    # pure-compute probe: reduce output inside (no big write)
    def dense_reduce(x):
        y = jnp.dot(x, w1, preferred_element_type=jnp.float32)
        return y.sum(), x * jnp.bfloat16(1.0 + 1e-6)

    timed("dense fc1 (reduced)", dense_reduce, FL // 2)

    # big-matmul sanity: 4096^3
    a = jnp.asarray(rs.randn(4096, 4096), jnp.bfloat16)

    def big(x):
        y = jnp.dot(a, a, preferred_element_type=jnp.bfloat16)
        return y.ravel()[0].astype(jnp.float32), x
    timed("4096^3 matmul", big, 2 * 4096 ** 3)


if __name__ == "__main__":
    main()
