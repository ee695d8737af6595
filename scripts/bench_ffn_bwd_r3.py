"""Round-3 FFN-backward experiments at the flagship shape (D=384, H=1536,
E=8, bf16). Targets the dw-accumulate gap (unified bwd at ~68% of its 5-GEMM
peak, dx-only at 89% — scripts/bench_ffn_bwd_variants.py):

1. larger row tiles (fewer output-ref read-modify-write steps per expert)
2. scratch f32 accumulators + boundary-only output writes (no output-ref
   read-modify-write at all)
3. 8-term erf poly in the gelu/gelu' pair (VPU cost of the poly chain)

Each variant is compared against ITS OWN 5-GEMM peak (tile choice changes the
padded token count).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from slim_switch_moe_vit_tpu.ops import fused_ffn as ff  # noqa: E402
from bench_ffn_bwd_variants import timed  # noqa: E402

D, H, E = 384, 1536, 8
T0 = 52480  # production padded token count at b128 (tile 256)
K = 20
PEAK = 197e12


def mk_inputs(T):
    rs = np.random.RandomState(0)
    xs = jnp.asarray(rs.randn(T, D) * 0.05, jnp.bfloat16)
    dy = jnp.asarray(rs.randn(T, D) * 0.05, jnp.bfloat16)
    w1 = jnp.asarray(rs.randn(E, D, H) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(np.zeros((E, H)), jnp.float32)
    w2 = jnp.asarray(rs.randn(E, H, D) * 0.05, jnp.bfloat16)
    return xs, dy, w1, b1, w2


def e_of_tile_for(T, tile):
    n_tiles = T // tile
    per = -(-n_tiles // E)
    return jnp.asarray(np.repeat(np.arange(E), per)[:n_tiles], jnp.int32)


# ---- production kernel but parametric tile (output-ref accumulate) ----
def bwd_tile(dy, xs, w1, b1, w2, e_of_tile, tile):
    T = xs.shape[0]
    H2 = H // 2
    n_tiles = T // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2, n_tiles),
        in_specs=[
            pl.BlockSpec((tile, D), lambda hh, i, e: (i, 0)),
            pl.BlockSpec((tile, D), lambda hh, i, e: (i, 0)),
            pl.BlockSpec((1, D, H2), lambda hh, i, e: (e[i], 0, hh)),
            pl.BlockSpec((1, 1, H2), lambda hh, i, e: (e[i], 0, hh)),
            pl.BlockSpec((1, H2, D), lambda hh, i, e: (e[i], hh, 0)),
            pl.BlockSpec((8, 1), lambda hh, i, e: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, D), lambda hh, i, e: (hh, i, 0)),
            pl.BlockSpec((1, D, H2), lambda hh, i, e: (e[i], 0, hh)),
            pl.BlockSpec((1, 1, H2), lambda hh, i, e: (e[i], 0, hh)),
            pl.BlockSpec((1, H2, D), lambda hh, i, e: (e[i], hh, 0)),
            pl.BlockSpec((1, 1, 1, D), lambda hh, i, e: (hh, e[i], 0, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(ff._bwd_kernel, gelu_pair=ff._gelu_pair_fn(xs.dtype),
                          has_scale=False),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((2, T, D), xs.dtype),
            jax.ShapeDtypeStruct((E, D, H), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((E, H, D), jnp.float32),
            jax.ShapeDtypeStruct((2, E, 1, D), jnp.float32),
        ],
    )(e_of_tile, dy, xs, w1, b1[:, None], w2,
      jnp.zeros((8, 1), jnp.float32))


# ---- scratch-accumulator kernel: dw accumulated in VMEM scratch, outputs
# written ONCE per (expert, half) at the boundary step ----
def _bwd_kernel_scratch(e_ref, dy_ref, x_ref, w1_ref, b1_ref, w2_ref,
                        dxp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                        dw1_s, db1_s, dw2_s, db2_s, *, gelu_pair, n_tiles):
    i = pl.program_id(1)
    first = jnp.logical_or(i == 0, e_ref[i] != e_ref[jnp.maximum(i - 1, 0)])
    last = jnp.logical_or(
        i == n_tiles - 1,
        e_ref[jnp.minimum(i + 1, n_tiles - 1)] != e_ref[i])
    x = x_ref[:]
    dy = dy_ref[:]
    h = jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32)
    h = h + b1_ref[0, 0].astype(jnp.float32)
    g32, dg = gelu_pair(h)
    dyh = jax.lax.dot_general(dy, w2_ref[0], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh = dyh * dg
    dhb = dh.astype(x.dtype)
    dxp = jax.lax.dot_general(dhb, w1_ref[0], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dxp_ref[0] = dxp.astype(dxp_ref.dtype)
    dw1 = jax.lax.dot_general(x, dhb, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh, axis=0)[None]
    g = g32.astype(x.dtype)
    dw2 = jax.lax.dot_general(g, dy, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(dy.astype(jnp.float32), axis=0)[None]

    @pl.when(first)
    def _():
        dw1_s[:] = dw1
        db1_s[:] = db1
        dw2_s[:] = dw2
        db2_s[:] = db2

    @pl.when(jnp.logical_not(first))
    def _():
        dw1_s[:] = dw1_s[:] + dw1
        db1_s[:] = db1_s[:] + db1
        dw2_s[:] = dw2_s[:] + dw2
        db2_s[:] = db2_s[:] + db2

    @pl.when(last)
    def _():
        dw1_ref[0] = dw1_s[:]
        db1_ref[0, 0] = db1_s[0]
        dw2_ref[0] = dw2_s[:]
        db2_ref[0, 0, 0] = db2_s[0]


def bwd_scratch(dy, xs, w1, b1, w2, e_of_tile, tile):
    T = xs.shape[0]
    H2 = H // 2
    n_tiles = T // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2, n_tiles),
        in_specs=[
            pl.BlockSpec((tile, D), lambda hh, i, e: (i, 0)),
            pl.BlockSpec((tile, D), lambda hh, i, e: (i, 0)),
            pl.BlockSpec((1, D, H2), lambda hh, i, e: (e[i], 0, hh)),
            pl.BlockSpec((1, 1, H2), lambda hh, i, e: (e[i], 0, hh)),
            pl.BlockSpec((1, H2, D), lambda hh, i, e: (e[i], hh, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, D), lambda hh, i, e: (hh, i, 0)),
            pl.BlockSpec((1, D, H2), lambda hh, i, e: (e[i], 0, hh)),
            pl.BlockSpec((1, 1, H2), lambda hh, i, e: (e[i], 0, hh)),
            pl.BlockSpec((1, H2, D), lambda hh, i, e: (e[i], hh, 0)),
            pl.BlockSpec((1, 1, 1, D), lambda hh, i, e: (hh, e[i], 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, H2), jnp.float32),
            pltpu.VMEM((1, H2), jnp.float32),
            pltpu.VMEM((H2, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel_scratch,
                          gelu_pair=ff._gelu_pair_fn(xs.dtype),
                          n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((2, T, D), xs.dtype),
            jax.ShapeDtypeStruct((E, D, H), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((E, H, D), jnp.float32),
            jax.ShapeDtypeStruct((2, E, 1, D), jnp.float32),
        ],
    )(e_of_tile, dy, xs, w1, b1[:, None], w2)


def check(name, got, want, tol=2e-2):
    ok = True
    for a, b, nm in zip(got, want, ("dx", "dw1", "db1", "dw2", "db2")):
        d = float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32) -
                                  jnp.asarray(b, jnp.float32))))
        scale = float(jnp.max(jnp.abs(jnp.asarray(b, jnp.float32)))) or 1.0
        if d / scale > tol:
            print(f"  !! {name} {nm} rel diff {d / scale:.3e}")
            ok = False
    print(f"{name}: {'outputs OK' if ok else 'MISMATCH'}")
    return ok


def main():
    xs, dy, w1, b1, w2 = mk_inputs(T0)
    e256 = e_of_tile_for(T0, 256)

    def fivegemm_ms(T):
        return 5 * T * D * H * 2 / PEAK * 1000

    print(f"[T={T0}] 5-GEMM peak {fivegemm_ms(T0):.3f} ms")
    base = timed("prod unified bwd (tile 256)",
                 lambda dy_, *a: ff._bwd(dy_, *a)[0], dy, xs, w1, b1, w2, e256)

    # reference outputs for correctness
    ref = ff._bwd(dy, xs, w1, b1, w2, e256)
    ref = (ref[0], ref[1], ref[2], ref[3], ref[4])

    # scratch accumulate, tile 256 (same layout as production)
    try:
        out = bwd_scratch(dy, xs, w1, b1, w2, e256, 256)
        got = (out[0][0] + out[0][1], out[1], out[2][:, 0], out[3],
               out[4][0, :, 0, :])
        check("scratch tile 256", got, ref)
        timed("scratch-accum bwd (tile 256)",
              lambda dy_, *a: bwd_scratch(dy_, *a, 256)[0],
              dy, xs, w1, b1, w2, e256)
    except Exception as e:  # noqa: BLE001
        print(f"# scratch tile 256 failed: {type(e).__name__}: {e}")

    # larger tiles: 640 rows (82 tiles) and 1280 (41)
    for tile in (640, 1280):
        n = -(-T0 // tile)
        T = n * tile
        xs2, dy2, w12, b12, w22 = mk_inputs(T)
        et = e_of_tile_for(T, tile)
        print(f"[T={T}] 5-GEMM peak {fivegemm_ms(T):.3f} ms (tile {tile})")
        try:
            timed(f"unified bwd (tile {tile})",
                  lambda dy_, *a: bwd_tile(dy_, *a, tile),
                  dy2, xs2, w12, b12, w22, et)
        except Exception as e:  # noqa: BLE001
            print(f"# tile {tile} output-accum failed: {type(e).__name__}")
        try:
            timed(f"scratch-accum bwd (tile {tile})",
                  lambda dy_, *a: bwd_scratch(dy_, *a, tile)[0],
                  dy2, xs2, w12, b12, w22, et)
        except Exception as e:  # noqa: BLE001
            print(f"# tile {tile} scratch failed: {type(e).__name__}")


if __name__ == "__main__":
    main()
