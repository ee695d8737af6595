"""Real-TPU validation of fused_expert_ffn_permuted (VERDICT r4 #8).

The permuted variant resolves row-tile indices through a SECOND
scalar-prefetch operand in the BlockSpec index maps — a lowering pattern
interpret mode cannot vouch for (same risk class as the r4 stale-scratch
bug). This runs the real Mosaic kernel on the chip with an interleaved
(source-major) layout at flagship-like width (D=384, H=1536) and checks
forward + all five gradients against the relayout-then-base-kernel form,
elementwise. Also times both forms. Exits nonzero on mismatch/NaN.

Usage (TPU): python scripts/check_perm_ffn_tpu.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from slim_switch_moe_vit_tpu.ops.fused_ffn import (
        TILE_ROWS, fused_expert_ffn, fused_expert_ffn_permuted,
    )

    rs = np.random.RandomState(0)
    D, H, E = 384, 1536, 8
    src, n_per = 4, 6  # 4 source blocks x 8 experts x 6 tiles = 192 tiles
    n_tiles = src * E * n_per
    Tp = n_tiles * TILE_ROWS
    xs = jnp.asarray(rs.randn(Tp, D), jnp.bfloat16)
    w1 = jnp.asarray(rs.randn(E, D, H) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rs.randn(E, H) * 0.05, jnp.float32)
    w2 = jnp.asarray(rs.randn(E, H, D) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rs.randn(E, D) * 0.05, jnp.float32)
    dy = jnp.asarray(rs.randn(Tp, D), jnp.bfloat16)

    perm = jnp.asarray(np.arange(n_tiles, dtype=np.int32).reshape(
        src, E, n_per).transpose(1, 0, 2).reshape(-1))
    e_of_step = jnp.asarray(np.repeat(np.arange(E, dtype=np.int32),
                                      src * n_per))

    def f_perm(xs, w1, b1, w2, b2):
        return fused_expert_ffn_permuted(xs, w1, b1, w2, b2, e_of_step, perm)

    def f_ref(xs, w1, b1, w2, b2):
        xr = xs.reshape(src, E, n_per * TILE_ROWS, D).transpose(1, 0, 2, 3)
        out = fused_expert_ffn(xr.reshape(Tp, D), w1, b1, w2, b2, e_of_step)
        out = out.reshape(E, src, n_per * TILE_ROWS, D).transpose(1, 0, 2, 3)
        return out.reshape(Tp, D)

    def vjp_all(f):
        def run(xs, w1, b1, w2, b2):
            y, pull = jax.vjp(f, xs, w1, b1, w2, b2)
            return (y,) + pull(dy)
        return jax.jit(run)

    run_p, run_r = vjp_all(f_perm), vjp_all(f_ref)
    outs_p = [np.asarray(a, np.float32) for a in run_p(xs, w1, b1, w2, b2)]
    outs_r = [np.asarray(a, np.float32) for a in run_r(xs, w1, b1, w2, b2)]

    names = ("y", "dx", "dw1", "db1", "dw2", "db2")
    rtol, atol = 2e-2, 1e-3
    bad = 0
    for a, b, nm in zip(outs_p, outs_r, names):
        if not np.isfinite(a).all():
            print(f"FAIL {nm}: non-finite values in permuted output")
            bad += 1
            continue
        excess = np.abs(a - b) - (rtol * np.abs(b) + atol)
        ok = bool((excess <= 0).all())
        worst = np.unravel_index(np.argmax(excess), excess.shape)
        print(f"{'ok  ' if ok else 'FAIL'} {nm}: max_abs_diff="
              f"{np.abs(a - b).max():.3e}, worst {worst}: got {a[worst]:.5f}"
              f" want {b[worst]:.5f}")
        bad += 0 if ok else 1
    if bad:
        sys.exit(1)

    # timing: fetch one element to force execution (tunnel semantics)
    for nm, fn in (("permuted", run_p), ("relayout", run_r)):
        fn(xs, w1, b1, w2, b2)  # compile+warm
        reps = 20
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = fn(xs, w1, b1, w2, b2)
        _ = float(acc[0][0, 0])
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{nm}: {dt:.3f} ms/iter (fwd+bwd, {Tp} rows)")
    print("permuted FFN matches the relayout form on", jax.devices()[0])


if __name__ == "__main__":
    main()
