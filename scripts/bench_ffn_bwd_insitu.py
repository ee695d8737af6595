"""Decompose the FFN-backward in-model vs standalone gap (VERDICT r4 #2).

The r3/r4 standalone number (89% of the 5-GEMM peak for the dx path, 74%
in-model) was measured with (a) CONCRETE e_of_tile, (b) perfectly BALANCED
expert groups, (c) no dy_scale. The in-model kernel differs on all three
plus (d) it shares HBM with the neighboring dispatch gathers under XLA's
scheduler. This script flips each factor independently on the real chip so
the ~3.5 ms/step gap gets attributed per cause:

  1. baseline: concrete + balanced + no scale   (the r3 measurement)
  2. + dy_scale (has_scale=True — production folds combine weights in)
  3. + traced e_of_tile (a jit argument, like the dropless in-model call)
  4. + realistic imbalance (multinomial router counts, tile-quantized)
  5. all three together (the in-model kernel invocation, minus neighbors)

Prints ms/call and %-of-5-GEMM-peak per variant. Anything left between
variant 5 and the in-model profile (scripts/profile_flagship.py) is
scheduler overlap/HBM contention, not kernel inefficiency.

Usage (TPU): python scripts/bench_ffn_bwd_insitu.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

D, H, E = 384, 1536, 8
T0 = 52480  # production padded token count at b128 (tile 256)
PEAK = 197e12
REPS, K = 3, 20


def main():
    import jax
    import jax.numpy as jnp

    from slim_switch_moe_vit_tpu.ops import fused_ffn as ff

    rs = np.random.RandomState(0)
    xs = jnp.asarray(rs.randn(T0, D) * 0.05, jnp.bfloat16)
    dy = jnp.asarray(rs.randn(T0, D) * 0.05, jnp.bfloat16)
    w1 = jnp.asarray(rs.randn(E, D, H) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(np.zeros((E, H)), jnp.float32)
    w2 = jnp.asarray(rs.randn(E, H, D) * 0.05, jnp.bfloat16)
    ws = jnp.asarray(rs.rand(T0), jnp.float32)

    n_tiles = T0 // ff.TILE_ROWS
    per = n_tiles // E
    e_balanced = np.repeat(np.arange(E, dtype=np.int32), per)
    e_balanced = np.concatenate(
        [e_balanced, np.full(n_tiles - e_balanced.size, E - 1, np.int32)])
    # realistic dropless imbalance: multinomial over a mildly-peaked router
    p = np.exp(0.35 * rs.randn(E))
    p /= p.sum()
    counts = rs.multinomial(n_tiles - E, p) + 1  # min one tile each
    e_imbal = np.repeat(np.arange(E, dtype=np.int32), counts)

    peak_ms = 5 * T0 * D * H * 2 / PEAK * 1000

    def timed(name, fn, *args):
        """Scan+trace harness (same methodology as bench_ffn_bwd_variants.py,
        the r3 89% source): K kernel calls inside ONE jitted lax.scan with a
        carry-fed dy, then the kernel's own device time from the profiler —
        per-call tunnel dispatch (~1.6 ms/call here) and the scan carry are
        excluded, so %-of-peak is comparable across rounds."""
        import tempfile

        from slim_switch_moe_vit_tpu.utils.profiling import (
            summarize_trace, trace,
        )

        @jax.jit
        def run(a0, rest):
            def body(c, _):
                out = fn(c, *rest)
                leaf = jax.tree.leaves(out)[0]
                bump = leaf.ravel()[0].astype(c.dtype) * jnp.asarray(
                    1e-12, c.dtype)
                return c + bump, leaf.ravel()[0]
            _, outs = jax.lax.scan(body, a0, None, length=K)
            return outs[-1]

        _ = float(run(args[0], args[1:]))  # compile+warm
        t0 = time.perf_counter()
        _ = float(run(args[0], args[1:]))
        wall = (time.perf_counter() - t0) / K * 1000
        with tempfile.TemporaryDirectory() as td:
            with trace(td):
                _ = float(run(args[0], args[1:]))
            rows = summarize_trace(td, top=4, steps=K)
        ms = rows[0][0] if rows else float("nan")
        print(f"{name:46s} {ms:7.3f} ms kernel ({peak_ms / ms * 100:5.1f}% "
              f"of 5-GEMM peak {peak_ms:.2f} ms; {wall:.3f} wall)",
              flush=True)
        return ms

    # 1. r3 baseline: concrete balanced, no scale
    f1 = jax.jit(lambda dy, xs, w1, b1, w2: ff._bwd(
        dy, xs, w1, b1, w2, jnp.asarray(e_balanced)))
    timed("1 concrete+balanced+noscale (r3 baseline)", f1, dy, xs, w1, b1, w2)

    # 2. + dy_scale
    f2 = jax.jit(lambda dy, xs, w1, b1, w2, ws: ff._bwd(
        dy, xs, w1, b1, w2, jnp.asarray(e_balanced), dy_scale=ws))
    timed("2 + dy_scale", f2, dy, xs, w1, b1, w2, ws)

    # 3. + traced e_of_tile (jit argument)
    f3 = jax.jit(lambda dy, xs, w1, b1, w2, et: ff._bwd(
        dy, xs, w1, b1, w2, et))
    timed("3 + traced e_of_tile", f3, dy, xs, w1, b1, w2,
          jnp.asarray(e_balanced))

    # 4. + imbalance (concrete)
    f4 = jax.jit(lambda dy, xs, w1, b1, w2: ff._bwd(
        dy, xs, w1, b1, w2, jnp.asarray(e_imbal)))
    timed("4 + imbalanced groups (concrete)", f4, dy, xs, w1, b1, w2)

    # 5. all: traced + imbalanced + scale (the in-model invocation)
    f5 = jax.jit(lambda dy, xs, w1, b1, w2, et, ws: ff._bwd(
        dy, xs, w1, b1, w2, et, dy_scale=ws))
    timed("5 traced+imbalanced+scale (in-model form)", f5, dy, xs, w1, b1,
          w2, jnp.asarray(e_imbal), ws)


if __name__ == "__main__":
    main()
