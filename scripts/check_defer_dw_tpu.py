"""Real-TPU validation of the deferred-dw backward (SSMV_DEFER_DW=1).

The defer kernel's single-tile flush reads VMEM scratch halves that are
uninitialized before the first paired write — interpret mode zero-fills
scratch and cannot catch staleness (the exact bug class of the r4
zero-token-expert fix). This script runs the REAL Mosaic kernel on the
chip with layouts that force every flush shape:

  * expert 0 owns exactly ONE tile   -> flush&&!include at grid step 0,
    scratch half 1 never written (the stale-VMEM case)
  * expert 1 owns >=4 tiles          -> paired flushes (include path)
  * expert 2 owns THREE tiles        -> paired flush + odd single-tile tail

and checks the gradients against the default per-tile backward on the
same device. Exits nonzero on mismatch/NaN. ~1 min incl. compiles.

Usage (TPU): python scripts/check_defer_dw_tpu.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from slim_switch_moe_vit_tpu.ops import fused_ffn
    from slim_switch_moe_vit_tpu.ops.fused_ffn import TILE_ROWS

    rs = np.random.RandomState(0)
    D, H = 256, 512
    E = 3
    # per-expert row counts in TILE_ROWS units: 1, 4, 3 (see module doc)
    tiles = [1, 4, 3]
    e_of_tile = np.repeat(np.arange(E), tiles).astype(np.int32)
    Tp = int(e_of_tile.size) * TILE_ROWS
    xs = jnp.asarray(rs.randn(Tp, D), jnp.bfloat16)
    w1 = jnp.asarray(rs.randn(E, D, H) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rs.randn(E, H) * 0.05, jnp.float32)
    w2 = jnp.asarray(rs.randn(E, H, D) * 0.05, jnp.bfloat16)
    dy = jnp.asarray(rs.randn(Tp, D), jnp.bfloat16)
    ws = jnp.asarray(rs.rand(Tp), jnp.float32)
    et = jnp.asarray(e_of_tile)

    def run(defer):
        # defer_dw passed explicitly — _bwd does not read SSMV_DEFER_DW
        # (the env knob is resolved by _ffn_bwd at trace time)
        f = jax.jit(lambda dy, xs, w1, b1, w2, ws: fused_ffn._bwd(
            dy, xs, w1, b1, w2, et, dy_scale=ws, defer_dw=defer))
        return [np.asarray(a, np.float32) for a in f(dy, xs, w1, b1, w2, ws)]

    base = run(False)
    defer = run(True)
    names = ("dx", "dw1", "db1", "dw2", "db2")
    bad = 0
    # ELEMENTWISE criterion (r4 advisor): a tolerance scaled by the tensor-
    # wide max would let a localized error up to 2% of the LARGEST entry
    # anywhere in dw1/dw2 pass undetected — exactly the stale-scratch bug
    # class this script exists to catch. Each element must match within
    # rtol of ITS OWN reference magnitude (bf16 stash rounding) plus a
    # small absolute floor for near-cancelled entries.
    rtol, atol = 2e-2, 1e-3
    for a, b, nm in zip(defer, base, names):
        if not np.isfinite(a).all():
            print(f"FAIL {nm}: non-finite values in defer output")
            bad += 1
            continue
        excess = np.abs(a - b) - (rtol * np.abs(b) + atol)
        ok = bool((excess <= 0).all())
        worst = np.unravel_index(np.argmax(excess), excess.shape)
        print(f"{'ok  ' if ok else 'FAIL'} {nm}: max_abs_diff="
              f"{np.abs(a - b).max():.3e}, worst elem {worst}: "
              f"got {a[worst]:.5f} want {b[worst]:.5f} "
              f"(excess over rtol={rtol}/atol={atol}: "
              f"{max(excess[worst], 0.0):.3e})")
        bad += 0 if ok else 1
    if bad:
        sys.exit(1)
    print("defer-dw backward matches the base backward on", jax.devices()[0])


if __name__ == "__main__":
    main()
