"""Diagnose the unified FFN backward kernel's MXU efficiency at the flagship
shape (Tp=52480, D=384, H=1536, E=8, bf16). Variants isolate which output
group (dx vs dw) limits the pipeline, and test tile sizes.
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

T, D, H, E = 52480, 384, 1536, 8
K = 20


def timed(name, fn, *args):
    """Trace-based: report the pallas/gemm kernel's own device time, excluding
    the scan-carry harness (which costs ~0.7 ms/iter at these sizes).

    DCE HAZARD: the scan carry consumes only element [0] of the output, which
    is fine for OPAQUE ops (pallas_call, single XLA gather/dot) but lets XLA
    slice straight through concatenate/elementwise compositions — r3 measured
    a 'split gather' variant at exactly 1/p of the real cost because p-1 of
    the p gathers were dead-code-eliminated. For composite XLA expressions,
    consume the FULL output (out.sum()) and subtract a sum-baseline."""
    from slim_switch_moe_vit_tpu.utils.profiling import trace, summarize_trace

    @jax.jit
    def run(a0, rest):
        def body(c, _):
            out = fn(c, *rest)
            leaf = jax.tree.leaves(out)[0]
            return c + leaf.ravel()[0].astype(c.dtype) * jnp.asarray(1e-12, c.dtype), leaf.ravel()[0]
        c, outs = jax.lax.scan(body, a0, None, length=K)
        return outs[-1]

    _ = float(run(args[0], args[1:]))
    t0 = time.perf_counter()
    _ = float(run(args[0], args[1:]))
    wall = (time.perf_counter() - t0) / K * 1000
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        with trace(td):
            _ = float(run(args[0], args[1:]))
        rows = summarize_trace(td, top=4, steps=K)
    main_ms = rows[0][0] if rows else float("nan")
    label = rows[0][2][:40] if rows else ""
    print(f"{name:34s} {main_ms:8.3f} ms kernel  ({wall:.3f} wall)  [{label}]",
          flush=True)
    return main_ms


def make_e_of_tile(tile):
    n_tiles = T // tile
    per = -(-n_tiles // E)  # ceil: last expert owns the remainder tiles
    return jnp.asarray(np.repeat(np.arange(E), per)[:n_tiles], jnp.int32)


# ---- dx-only kernel: h recompute + dh + dx (3 GEMMs) ----
def _dx_kernel(e_ref, dy_ref, x_ref, w1_ref, b1_ref, w2_ref, dxp_ref, *,
               gelu, dgelu):
    x = x_ref[:]
    dy = dy_ref[:]
    h = jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32)
    h = h + b1_ref[0, 0].astype(jnp.float32)
    dyh = jax.lax.dot_general(dy, w2_ref[0], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh = (dyh * dgelu(h)).astype(x.dtype)
    dxp_ref[0] = jax.lax.dot_general(
        dh, w1_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dxp_ref.dtype)


def dx_only(dy, xs, w1, b1, w2, e_of_tile, tile):
    n_tiles = T // tile
    H2 = H // 2
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
        out_specs=pl.BlockSpec((1, tile, D), lambda hh, i, e: (hh, i, 0)),
    )
    gelu, dgelu = ff._gelu_fns(xs.dtype)
    return pl.pallas_call(
        functools.partial(_dx_kernel, gelu=gelu, dgelu=dgelu),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, T, D), xs.dtype),
    )(e_of_tile, dy, xs, w1, b1[:, None], w2)


# ---- dw-only kernel: h recompute + dh + dw1 + dw2 (4 GEMMs) ----
def _dw_kernel(e_ref, dy_ref, x_ref, w1_ref, b1_ref, w2_ref,
               dw1_ref, dw2_ref, *, gelu, dgelu):
    i = pl.program_id(1)
    first = jnp.logical_or(i == 0, e_ref[i] != e_ref[jnp.maximum(i - 1, 0)])
    x = x_ref[:]
    dy = dy_ref[:]
    h = jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32)
    h = h + b1_ref[0, 0].astype(jnp.float32)
    dyh = jax.lax.dot_general(dy, w2_ref[0], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dhb = (dyh * dgelu(h)).astype(x.dtype)
    dw1 = jax.lax.dot_general(x, dhb, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)[None]
    g = gelu(h).astype(x.dtype)
    dw2 = jax.lax.dot_general(g, dy, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)[None]
    ff._accumulate(first, [(dw1_ref, dw1), (dw2_ref, dw2)])


def dw_only(dy, xs, w1, b1, w2, e_of_tile, tile):
    n_tiles = T // tile
    H2 = H // 2
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
            pl.BlockSpec((1, D, H2), lambda hh, i, e: (e[i], 0, hh)),
            pl.BlockSpec((1, H2, D), lambda hh, i, e: (e[i], hh, 0)),
        ],
    )
    gelu, dgelu = ff._gelu_fns(xs.dtype)
    return pl.pallas_call(
        functools.partial(_dw_kernel, gelu=gelu, dgelu=dgelu),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((E, D, H), jnp.float32),
            jax.ShapeDtypeStruct((E, H, D), jnp.float32),
        ],
    )(e_of_tile, dy, xs, w1, b1[:, None], w2)


# ---- i-major unified bwd: grid (n_tiles, 2) — x/dy loaded once per tile,
# dx accumulated in VMEM across the two hidden halves (no partials add),
# dw blocks span FULL H (indexed by expert only) with half-slice writes ----
def _bwd_kernel_imajor(e_ref, dy_ref, x_ref, w1_ref, b1_ref, w2_ref,
                       dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                       gelu_pair, H2):
    i = pl.program_id(0)
    hh = pl.program_id(1)
    first_tile = jnp.logical_or(i == 0,
                                e_ref[i] != e_ref[jnp.maximum(i - 1, 0)])
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

    @pl.when(hh == 0)
    def _():
        dx_ref[:] = dxp.astype(dx_ref.dtype)

    @pl.when(hh == 1)
    def _():
        dx_ref[:] = dx_ref[:] + dxp.astype(dx_ref.dtype)

    dw1 = jax.lax.dot_general(x, dhb, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)[None]
    db1 = jnp.sum(dh, axis=0)[None, None]
    g = g32.astype(x.dtype)
    dw2 = jax.lax.dot_general(g, dy, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)[None]

    # full-block accumulate with the half zero-padded to full H: partial
    # (static- or dynamic-slice) writes to revisited output refs crash the
    # Mosaic compiler, uniform whole-block read-modify-write does not
    first = first_tile
    z1 = jnp.zeros_like(dw1)
    dw1f = jnp.where(hh == 0, jnp.concatenate([dw1, z1], axis=2),
                     jnp.concatenate([z1, dw1], axis=2))
    zb = jnp.zeros_like(db1)
    db1f = jnp.where(hh == 0, jnp.concatenate([db1, zb], axis=2),
                     jnp.concatenate([zb, db1], axis=2))
    z2 = jnp.zeros_like(dw2)
    dw2f = jnp.where(hh == 0, jnp.concatenate([dw2, z2], axis=1),
                     jnp.concatenate([z2, dw2], axis=1))

    init = jnp.logical_and(first, hh == 0)  # (i_start, 1) must accumulate

    @pl.when(init)
    def _():
        dw1_ref[:] = dw1f
        db1_ref[:] = db1f
        dw2_ref[:] = dw2f

    @pl.when(jnp.logical_not(init))
    def _():
        dw1_ref[:] = dw1_ref[:] + dw1f
        db1_ref[:] = db1_ref[:] + db1f
        dw2_ref[:] = dw2_ref[:] + dw2f

    # write db2 on EVERY step (hh==1 contributes zero) — an output block
    # mapped but unwritten in some grid steps is another crash suspect
    db2 = jnp.sum(dy.astype(jnp.float32), axis=0)[None, None]
    db2 = jnp.where(hh == 0, db2, jnp.zeros_like(db2))

    @pl.when(init)
    def _():
        db2_ref[:] = db2

    @pl.when(jnp.logical_not(init))
    def _():
        db2_ref[:] = db2_ref[:] + db2


def bwd_imajor(dy, xs, w1, b1, w2, e_of_tile, tile):
    n_tiles = T // tile
    H2 = H // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, 2),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i, hh, e: (i, 0)),
            pl.BlockSpec((tile, D), lambda i, hh, e: (i, 0)),
            pl.BlockSpec((1, D, H2), lambda i, hh, e: (e[i], 0, hh)),
            pl.BlockSpec((1, 1, H2), lambda i, hh, e: (e[i], 0, hh)),
            pl.BlockSpec((1, H2, D), lambda i, hh, e: (e[i], hh, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, D), lambda i, hh, e: (i, 0)),
            pl.BlockSpec((1, D, H), lambda i, hh, e: (e[i], 0, 0)),
            pl.BlockSpec((1, 1, H), lambda i, hh, e: (e[i], 0, 0)),
            pl.BlockSpec((1, H, D), lambda i, hh, e: (e[i], 0, 0)),
            pl.BlockSpec((1, 1, D), lambda i, hh, e: (e[i], 0, 0)),
        ],
    )
    gelu_pair = ff._gelu_pair_fn(xs.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_imajor, gelu_pair=gelu_pair, H2=H2),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, D), xs.dtype),
            jax.ShapeDtypeStruct((E, D, H), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((E, H, D), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, D), jnp.float32),
        ],
    )(e_of_tile, dy, xs, w1, b1[:, None], w2)


def main():
    rs = np.random.RandomState(0)
    xs = jnp.asarray(rs.randn(T, D) * 0.05, jnp.bfloat16)
    dy = jnp.asarray(rs.randn(T, D) * 0.05, jnp.bfloat16)
    w1 = jnp.asarray(rs.randn(E, D, H) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(np.zeros((E, H)), jnp.float32)
    w2 = jnp.asarray(rs.randn(E, H, D) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(np.zeros((E, D)), jnp.float32)

    e256 = make_e_of_tile(256)

    # reference points
    peak = 197e12
    g = T * D * H * 2 / peak * 1000
    print(f"one GEMM at peak: {g:.3f} ms; 5 GEMMs: {5*g:.3f} ms; "
          f"3: {3*g:.3f}; 4: {4*g:.3f}")

    timed("noop (1 elementwise pass)", lambda x_: x_ * 1.0000001, xs)
    timed("xla gemm (T,D)@(D,H)",
          lambda x_, w_: jnp.dot(x_, w_, preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16), xs, w1[0])
    timed("fwd (2 GEMMs)",
          lambda x_, *a: ff._fwd(x_, *a), xs, w1, b1, w2, b2, e256)
    timed("unified bwd (5 GEMMs)",
          lambda dy_, *a: ff._bwd(dy_, *a)[0], dy, xs, w1, b1, w2, e256)
    timed("dx-only (3 GEMMs)",
          lambda dy_, *a: dx_only(dy_, *a, 256), dy, xs, w1, b1, w2, e256)
    timed("dw-only (4 GEMMs)",
          lambda dy_, *a: dw_only(dy_, *a, 256), dy, xs, w1, b1, w2, e256)

    # i-major variant: PARKED. Bisection result (r2): dx-only i-major with
    # VMEM accumulation across the hh dim compiles and matches production
    # exactly, but adding any full-H dw output (whole-block accumulate,
    # zero-padded halves, every output written every step) either crashes
    # the Mosaic compiler or hangs it >10 min. Guarded so this script stays
    # usable.
    try:
        ref = ff._bwd(dy, xs, w1, b1, w2, e256)
        im = bwd_imajor(dy, xs, w1, b1, w2, e256, 256)
        for a, b, nm in [(im[0], ref[0], "dx"), (im[1], ref[1], "dw1"),
                         (im[3], ref[3], "dw2")]:
            d = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                      b.astype(jnp.float32))))
            print(f"imajor {nm} max diff: {d:.3e}")
        timed("bwd i-major (full-H dw)",
              lambda dy_, *a: bwd_imajor(dy_, *a, 256), dy, xs, w1, b1, w2,
              e256)
    except Exception as e:  # noqa: BLE001 - known Mosaic compiler crash
        print(f"# i-major variant failed (known Mosaic issue): "
              f"{type(e).__name__}")

    # ---- ceiling check: GELU stubbed to identity (measures poly VPU cost)
    import unittest.mock as mock

    def id_fns(dtype):
        return (lambda h: h), (lambda h: jnp.ones_like(h))

    def id_pair(dtype):
        return lambda h: (h, jnp.ones_like(h))

    # patch BOTH entry points: _fwd uses _gelu_fns, the unified bwd uses the
    # shared-CDF _gelu_pair_fn (was stale after the r2 pair-fn switch)
    with mock.patch.object(ff, "_gelu_fns", id_fns), \
            mock.patch.object(ff, "_gelu_pair_fn", id_pair):
        timed("fwd NO-GELU ceiling",
              lambda x_, *a: ff._fwd(x_, *a), xs, w1, b1, w2, b2, e256)
        timed("unified bwd NO-GELU ceiling",
              lambda dy_, *a: ff._bwd(dy_, *a)[0], dy, xs, w1, b1, w2, e256)


if __name__ == "__main__":
    main()
