"""Microbench MoE GEMM strategies on the real chip.

Compares, at flagship shapes (T*k=50432 rows, d=384, h=1536, E=8):
  dense      one (50432,384)@(384,1536) dot — the MXU baseline
  ragged     jax.lax.ragged_dot with 8 equal groups
  einsum     batched (8,6304,384)@(8,384,1536)
  gmm        jax.experimental.pallas.ops.tpu.megablox gmm
  take_rows  gather 50432 rows of (25216,384)
Each timed as K iterations inside one jitted scan (value fetch forces run).
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

K = 200
T2, D, H, E = 50432, 384, 1536, 8
C = T2 // E


def timed(name, fn, *args):
    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(*c)
            # fold a scalar of the output back into the first arg to defeat
            # hoisting/CSE while keeping the op shape identical
            a0 = args[0] + (out.ravel()[0] * 1e-9).astype(args[0].dtype)
            return (a0,) + tuple(args[1:]), out.ravel()[0]
        c, outs = jax.lax.scan(body, args, None, length=K)
        return outs[-1]

    r = run(args)
    _ = float(r)  # compile+warm
    t0 = time.perf_counter()
    _ = float(run(args))
    dt = (time.perf_counter() - t0) / K * 1000
    flops = 2 * T2 * D * H
    print(f"{name:12s} {dt:8.3f} ms   {flops / dt / 1e9:8.1f} GFLOP/s-eff")
    return dt


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(T2, D), jnp.bfloat16)
    w = jnp.asarray(rs.randn(D, H), jnp.bfloat16)
    we = jnp.asarray(rs.randn(E, D, H), jnp.bfloat16)
    xb = x.reshape(E, C, D)
    gs = jnp.full((E,), C, jnp.int32)
    xs_small = jnp.asarray(rs.randn(T2 // 2, D), jnp.bfloat16)
    idx = jnp.asarray(rs.randint(0, T2 // 2, T2), jnp.int32)

    timed("dense", lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16), x, w)
    timed("einsum_b", lambda a, b: jnp.einsum("ecd,edh->ech", a, b,
                                              preferred_element_type=jnp.bfloat16), xb, we)
    timed("ragged", lambda a, b, g: jax.lax.ragged_dot(
        a, b, g, preferred_element_type=jnp.bfloat16), x, we, gs)
    try:
        from jax.experimental.pallas.ops.tpu.megablox import gmm as mb

        timed("gmm", lambda a, b, g: mb.gmm(a, b, g,
                                            preferred_element_type=jnp.bfloat16),
              x, we, gs)
    except Exception as e:
        print("gmm failed:", type(e).__name__, str(e)[:200])

    t = timed("take_rows", lambda a, i: jnp.take(a, i, axis=0), xs_small, idx)
    gb = (T2 // 2 * D * 2 + T2 * D * 2) / 1e9
    print(f"  take_rows moves ~{gb * 1000:.0f} MB -> {gb / (t / 1000):.0f} GB/s")


if __name__ == "__main__":
    main()
