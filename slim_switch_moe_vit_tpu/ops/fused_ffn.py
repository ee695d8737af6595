"""Fused per-expert FFN (fc1 -> GELU -> fc2) as Pallas TPU kernels.

This is the native-tier replacement for the two ``ragged_dot`` GEMMs +
bias one-hot GEMMs of ``moe_forward_ragged`` (the TPU equivalent of FastMoE's
fused CUDA expert kernels, reference ``models/resMoE.py:6``). Motivation
(measured on v5e, T*k=50432, d=384, h=1536): the unfused chain is
HBM-bound on the (T*k, h) hidden activations — fc1 writes 155 MB, gelu
reads+writes 310 MB, fc2 reads 155 MB. Fusing the chain keeps the hidden
tile in VMEM, cutting per-block traffic from ~470 MB to ~80 MB.

Layout contract: tokens are pre-sorted by expert and each expert's group
starts at a TILE_ROWS-aligned offset (see ``ops.moe.aligned_expert_layout``),
so every row tile belongs to exactly ONE expert — no masking inside the
kernel, and the per-expert weights are DMA'd once per expert (consecutive
tiles share the same weight block, which Pallas detects via the index map).
Padding rows carry zero cotangents by construction (they are never gathered
by the combine step), so they contribute nothing to any gradient.

Backward is a custom VJP with ONE unified kernel (grid (2, n_tiles), hidden
dim split in half per pass so the f32 dw accumulators fit VMEM): each pass
recomputes its half of h = x@w1+b1, computes the dx contribution
((dy@w2h^T)*gelu'(h))@w1h^T and accumulates dw1/db1/dw2 in VMEM f32 across
each expert's consecutive row tiles. Nothing is spilled to HBM between
backward stages — the previous 3-kernel design (dgrad spilling bf16 dh and
g=gelu(h), two wgrad kernels re-reading them) moved an extra ~640 MB/block;
the unified kernel re-reads only x and dy (~160 MB) and runs the same five
GEMMs. dx arrives as two half-hidden partials summed by XLA (fused into the
consumer), db2 (hidden-independent) is taken from the first pass.
"""
from __future__ import annotations

import functools
import os
import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 256    # layout alignment + forward/backward row tile
# Optional bigger backward tile: amortizes the per-step dw VMEM accumulates.
# Measured (scripts/bench_ffn_bwd_r3.py, flagship shape): 256->2.307
# ms/block, 512->2.019, 640->2.025, 768->2.006 vs the 1.57 5-GEMM peak
# (standalone); in-model the 512 path runs 7.7% faster per row but the
# static layout padding grows E*(512-256) rows = +4.4%, which the forward
# and every dispatch gather then pay — net ZERO end-to-end, so production
# stays on TILE_ROWS. The plumbing is kept (fused_expert_ffn(layout_rows=
# LAYOUT_ROWS) + aligned_expert_layout(tile=LAYOUT_ROWS)) for shapes where
# the trade flips (bigger batches dilute the fixed padding).
LAYOUT_ROWS = 512

_SQRT_2_OVER_PI = 0.7978845608028654


def _erf(x):
    """Abramowitz & Stegun 7.1.26 polynomial erf (max abs err 1.5e-7 in f32 —
    orders of magnitude below bf16 rounding). Mosaic has no erf lowering."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(h):
    # exact (erf) GELU to match jax.nn.gelu(approximate=False)
    return 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))


def _dgelu(h):
    # d/dh [h * Phi(h)] = Phi(h) + h * phi(h)
    phi = jnp.exp(-0.5 * h * h) * (1.0 / np.sqrt(2.0 * np.pi))
    cdf = 0.5 * (1.0 + _erf(h * (2.0 ** -0.5)))
    return cdf + h * phi


# Cheap GELU for bf16 activations: odd Chebyshev-fit polynomials in x^2, no
# exp and no divide (the exp+reciprocal erf chain costs ~7 ms/step at
# ViT-S/b128 — measured by stubbing GELU out). Max abs err 5.7e-4 (gelu) /
# 1.5e-3 (gelu'), an order below bf16 output rounding; f32 models keep the
# exact erf path, so golden f32 oracle tests stay exact.
_ERF9 = (1.12833833694458, -0.37545156478881836, 0.11103694140911102,
         -0.024968869984149933, 0.004174065310508013, -0.0005020671524107456,
         4.156155773671344e-05, -2.2227090994419996e-06,
         6.865127488708822e-08, -9.259459865518238e-10)
# erf(x)=x*P(x^2), |x|<=3.75, fit pinned at the endpoint: beyond the clip
# gelu ~= 0.5*h*(1+P(3.75^2)*3.75), so endpoint error multiplies h
_DG11 = (0.7978734970092773, -0.2658323049545288, 0.05958940461277962,
         -0.009303830564022064, 0.0010750615037977695,
         -9.375506488140672e-05, 6.1257278503035195e-06,
         -2.927916966655175e-07, 9.854714377866003e-09,
         -2.1980522957321114e-10, 2.9029749524372983e-12,
         -1.7130158850111633e-14)  # dgelu(h)-0.5 = h*Q(h^2), |h|<=5.2


def _odd_poly(coefs, x):
    t = x * x
    acc = jnp.full_like(x, coefs[-1])
    for c in coefs[-2::-1]:
        acc = acc * t + c
    return acc * x


def _gelu_poly(h):
    a = jnp.clip(h, -5.303, 5.303) * (2.0 ** -0.5)  # erf saturated beyond
    return 0.5 * h * (1.0 + _odd_poly(_ERF9, a))


def _dgelu_poly(h):
    return 0.5 + _odd_poly(_DG11, jnp.clip(h, -5.2, 5.2))


# h*phi(h) as an odd Chebyshev-fit poly (max abs err 9.0e-4, |h|<=5.2,
# ~0 beyond): lets the backward share the CDF term c between gelu and
# gelu' instead of evaluating two independent long polynomials:
#   c = Phi(h), gelu = h*c, gelu' = c + h*phi(h)
_HPHI9 = (0.39536367469384043, -0.19009602427274108, 0.042541909102134345,
          -0.005613073010076216, 0.00046539339512041304,
          -2.440916956143716e-05, 7.834568308044984e-07,
          -1.4010534845605805e-08, 1.0675213458574255e-10)


def _gelu_dgelu_poly(h):
    a = jnp.clip(h, -5.303, 5.303) * (2.0 ** -0.5)
    c = 0.5 * (1.0 + _odd_poly(_ERF9, a))       # Phi(h)
    return h * c, c + _odd_poly(_HPHI9, jnp.clip(h, -5.2, 5.2))


def _gelu_dgelu_exact(h):
    return _gelu(h), _dgelu(h)


def _gelu_fns(dtype):
    if jnp.dtype(dtype) == jnp.bfloat16:
        return _gelu_poly, _dgelu_poly
    return _gelu, _dgelu


def _gelu_pair_fn(dtype):
    if jnp.dtype(dtype) == jnp.bfloat16:
        return _gelu_dgelu_poly
    return _gelu_dgelu_exact


def gelu_fast(x):
    """exact-GELU semantics at the activation's own precision: bf16 tensors
    use the clipped odd-poly erf (max err 5.7e-4 — an order below bf16 output
    rounding; XLA's erf lowering costs ~2.7x more VPU time, measured), wider
    dtypes keep jax.nn.gelu(approximate=False). Poly evaluated in f32."""
    if x.dtype == jnp.bfloat16:
        return _gelu_poly(x.astype(jnp.float32)).astype(jnp.bfloat16)
    return jax.nn.gelu(x, approximate=False)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(e_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, *,
                gelu):
    h = jnp.dot(x_ref[:], w1_ref[0], preferred_element_type=jnp.float32)
    h = h + b1_ref[0, 0].astype(jnp.float32)
    g = gelu(h).astype(x_ref.dtype)
    y = jnp.dot(g, w2_ref[0], preferred_element_type=jnp.float32)
    y = y + b2_ref[0, 0].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _fwd(xs, w1, b1, w2, b2, e_of_tile, tile_perm=None):
    """``tile_perm``: optional (n_tiles,) int32 — grid step i reads row tile
    ``tile_perm[i]`` of xs and writes row tile ``tile_perm[i]`` of y, while
    ``e_of_tile[i]`` stays indexed by GRID STEP. Lets a caller whose rows are
    interleaved (the a2a EP source-major layout) iterate expert-major without
    materializing a transposed copy — the permutation rides the kernel's own
    block DMA via scalar-prefetch index maps."""
    Tp, D = xs.shape
    E, _, H = w1.shape
    n_tiles = Tp // TILE_ROWS
    if tile_perm is None:
        row = pl.BlockSpec((TILE_ROWS, D), lambda i, e: (i, 0))
        wmap = lambda i, e: (e[i], 0, 0)  # noqa: E731
        scalars = (e_of_tile,)
    else:
        row = pl.BlockSpec((TILE_ROWS, D), lambda i, e, p: (p[i], 0))
        wmap = lambda i, e, p: (e[i], 0, 0)  # noqa: E731
        scalars = (e_of_tile, tile_perm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(n_tiles,),
        in_specs=[
            row,
            pl.BlockSpec((1, D, H), wmap),
            pl.BlockSpec((1, 1, H), wmap),
            pl.BlockSpec((1, H, D), wmap),
            pl.BlockSpec((1, 1, D), wmap),
        ],
        out_specs=row,
    )
    kernel = functools.partial(_fwd_kernel, gelu=_gelu_fns(xs.dtype)[0])
    if tile_perm is not None:
        # the grid gets TWO scalar-prefetch refs; the kernel body only needs
        # e_ref (the perm acts purely through the index maps)
        base = kernel
        kernel = lambda e_ref, p_ref, *rest: base(e_ref, *rest)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, D), xs.dtype),
        interpret=_interpret(),
    )(*scalars, xs, w1, b1[:, None], w2, b2[:, None])


# ---------------------------------------------------------------------------
# backward: one kernel for dx, dw1, db1, dw2, db2 (hidden dim split in half
# across the outer grid dim so the f32 dw accumulators fit VMEM)
# ---------------------------------------------------------------------------

def _accumulate(first, refs_and_vals):
    @pl.when(first)
    def _():
        for ref, val in refs_and_vals:
            ref[:] = val

    @pl.when(jnp.logical_not(first))
    def _():
        for ref, val in refs_and_vals:
            ref[:] = ref[:] + val


def _tile_dx(x, dy, w1_ref, b1_ref, w2_ref, dxp_ref, gelu_pair):
    """Per-tile dx/db math shared by the three backward kernels
    (_bwd_kernel, _bwd_kernel_defer, _bwd_gather_kernel): recompute h and
    g = gelu(h) / dg = gelu'(h) for this hidden half (one evaluation
    sharing the CDF term), form dh = (dy @ w2h^T) * dg, write the dx
    partial, and return (dhb, g, db1, db2) — the caller picks its own dw
    strategy (per-tile GEMMs, deferred VMEM-paired GEMMs, ...)."""
    h = jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32)
    h = h + b1_ref[0, 0].astype(jnp.float32)
    g32, dg = gelu_pair(h)
    dyh = jax.lax.dot_general(
        dy, w2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = dyh * dg
    dhb = dh.astype(x.dtype)
    dxp = jax.lax.dot_general(
        dhb, w1_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dxp_ref[0] = dxp.astype(dxp_ref.dtype)
    db1 = jnp.sum(dh, axis=0)[None, None]
    db2 = jnp.sum(dy.astype(jnp.float32), axis=0)[None, None, None]
    return dhb, g32.astype(x.dtype), db1, db2


def _bwd_kernel(e_ref, dy_ref, x_ref, w1_ref, b1_ref, w2_ref, ws_ref,
                dxp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *, gelu_pair,
                has_scale):
    i = pl.program_id(1)
    first = jnp.logical_or(i == 0, e_ref[i] != e_ref[jnp.maximum(i - 1, 0)])
    x = x_ref[:]
    dy = dy_ref[:]
    if has_scale:
        # per-row combine weight folded in here (zero at padding slots) —
        # saves the standalone (Tp, D) select-multiply pass the combine VJP
        # would otherwise emit
        dy = dy * ws_ref[:].astype(dy.dtype)
    dhb, g, db1, db2 = _tile_dx(x, dy, w1_ref, b1_ref, w2_ref, dxp_ref,
                                gelu_pair)
    dw1 = jax.lax.dot_general(  # x^T @ dh -> (D, H2)
        x, dhb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None]
    dw2 = jax.lax.dot_general(  # g^T @ dy -> (H2, D)
        g, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None]
    _accumulate(first, [(dw1_ref, dw1), (db1_ref, db1), (dw2_ref, dw2),
                        (db2_ref, db2)])


def _bwd_flags(e_of_tile, n_tiles):
    """Per-tile control flags for the deferred-dw backward, packed int32:

    bit 0 (flush):   issue the dw GEMMs this step (2nd tile of a pair, or
                     the expert's last tile)
    bit 1 (include): the scratch's first half holds the previous tile of the
                     SAME expert — flush over both (K = 2*TILE_ROWS)
    bit 2 (first):   first flush of this expert's group — initialize the dw
                     window instead of accumulating

    Pure jnp on the (n_tiles,) ``e_of_tile`` (nondecreasing by layout
    contract), so it works for both concrete (capacity) and traced
    (dropless) layouts.
    """
    e = e_of_tile.astype(jnp.int32)
    idx = jnp.arange(n_tiles, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), e[:-1]])
    group_start = jax.lax.cummax(jnp.where(e != prev, idx, 0))
    pos = idx - group_start
    nxt = jnp.concatenate([e[1:], jnp.full((1,), -1, jnp.int32)])
    odd = (pos % 2) == 1
    flush = odd | (e != nxt)
    first = flush & (pos <= 1)
    return (flush.astype(jnp.int32) | (odd.astype(jnp.int32) << 1)
            | (first.astype(jnp.int32) << 2))


def _bwd_kernel_defer(e_ref, f_ref, dy_ref, x_ref, w1_ref, b1_ref, w2_ref,
                      ws_ref, dxp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                      xs_scr, dh_scr, g_scr, dy_scr, *, gelu_pair, has_scale,
                      tile):
    """_bwd_kernel variant that defers the dw GEMMs one tile: consecutive
    same-expert tiles stash x/dh/g/dy in VMEM scratch and flush ONE
    K=2*tile GEMM pair — the measured dw-accumulate win of LAYOUT_ROWS-row
    tiles (scripts/bench_ffn_bwd_r3.py) without any layout padding, valid
    for DYNAMIC e_of_tile (flags are scalar-prefetched, flushes never cross
    an expert boundary by construction). dx/db stay per-tile."""
    i = pl.program_id(1)
    flags = f_ref[i]
    flush = (flags & 1) != 0
    include = (flags & 2) != 0
    first_write = (flags & 4) != 0
    first = jnp.logical_or(i == 0, e_ref[i] != e_ref[jnp.maximum(i - 1, 0)])
    x = x_ref[:]
    dy = dy_ref[:]
    if has_scale:
        dy = dy * ws_ref[:].astype(dy.dtype)
    dhb, g, db1, db2 = _tile_dx(x, dy, w1_ref, b1_ref, w2_ref, dxp_ref,
                                gelu_pair)
    _accumulate(first, [(db1_ref, db1), (db2_ref, db2)])

    # stash this tile at scratch half pos%2 (== include at flush steps)
    @pl.when(jnp.logical_not(include))
    def _():
        xs_scr[0:tile] = x
        dh_scr[0:tile] = dhb
        g_scr[0:tile] = g
        dy_scr[0:tile] = dy

    @pl.when(include)
    def _():
        xs_scr[tile:] = x
        dh_scr[tile:] = dhb
        g_scr[tile:] = g
        dy_scr[tile:] = dy

    # single-tile flush (odd group size / 1-tile group): the second scratch
    # half holds a stale tile. Zero BOTH members of each dw product pair —
    # before the first paired write this half is uninitialized VMEM on real
    # TPU (interpret zero-fills), and NaN/Inf garbage times a zeroed
    # cotangent is still NaN, so zeroing dh/dy alone is not enough.
    @pl.when(jnp.logical_and(flush, jnp.logical_not(include)))
    def _():
        xs_scr[tile:] = jnp.zeros((tile, xs_scr.shape[1]), xs_scr.dtype)
        dh_scr[tile:] = jnp.zeros((tile, dh_scr.shape[1]), dh_scr.dtype)
        g_scr[tile:] = jnp.zeros((tile, g_scr.shape[1]), g_scr.dtype)
        dy_scr[tile:] = jnp.zeros((tile, dy_scr.shape[1]), dy_scr.dtype)

    @pl.when(flush)
    def _():
        dw1 = jax.lax.dot_general(  # (2*tile, D)^T @ (2*tile, H2)
            xs_scr[:], dh_scr[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[None]
        dw2 = jax.lax.dot_general(  # (2*tile, H2)^T @ (2*tile, D)
            g_scr[:], dy_scr[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[None]
        _accumulate(first_write, [(dw1_ref, dw1), (dw2_ref, dw2)])


def _bwd(dy, xs, w1, b1, w2, e_of_tile, dy_scale=None, tile=TILE_ROWS,
         defer_dw=False, tile_perm=None):
    """dx (as 2 half-hidden partials), dw1, db1, dw2, db2 in one pallas_call.

    Grid (2, n_tiles): the outer dim picks a hidden half, the inner streams
    row tiles; each (expert, half) dw window is visited by a consecutive tile
    run, accumulating in VMEM f32 and flushing once. db2 does not depend on
    the hidden half, so it is written per-half and the caller keeps half 0.
    ``dy_scale``: optional (Tp,) per-row factor multiplied into dy in-kernel.
    ``tile``: row-tile size — every group must be ``tile``-aligned; callers
    whose layout is LAYOUT_ROWS-aligned pass LAYOUT_ROWS here (e_of_tile
    stays at TILE_ROWS granularity and is subsampled).
    ``defer_dw``: pair consecutive same-expert tiles' dw GEMMs through VMEM
    scratch (see ``_bwd_kernel_defer``); requires tile == TILE_ROWS.
    """
    Tp, D = xs.shape
    E, _, H = w1.shape
    H2 = H // 2
    n_tiles = Tp // tile
    if tile != TILE_ROWS:
        assert tile % TILE_ROWS == 0 and Tp % tile == 0
        # The caller claims (via layout_rows) that every ``tile``-row window
        # spans a SINGLE expert; subsampling e_of_tile under a violated claim
        # would silently mis-accumulate dw/db. Verify when concrete (the
        # capacity paths build e_of_tile as a host constant); traced values
        # can't be checked here — aligned_expert_layout owns the guarantee.
        groups = e_of_tile.reshape(-1, tile // TILE_ROWS)
        if not isinstance(groups, jax.core.Tracer):
            gv = np.asarray(groups)
            assert (gv == gv[:, :1]).all(), (
                f"layout_rows={tile} claimed but a {tile}-row window spans "
                "multiple experts; layout is only TILE_ROWS-aligned")
        e_of_tile = groups[:, 0]
    has_scale = dy_scale is not None
    if tile_perm is not None:
        # permuted rows: grid step i streams row tile tile_perm[i] of dy/xs
        # and writes dx tile tile_perm[i]; e_of_tile stays grid-step-indexed
        # (the a2a EP caller orders grid steps expert-major over interleaved
        # source-major rows). Composes with neither defer_dw (its flags
        # grid already uses 2 scalar slots) nor bigger tiles.
        assert not defer_dw and tile == TILE_ROWS
    # f32 column vector (Tp, 1), block (tile, 1): the obvious
    # lane-major (1, 1, tile) bf16 block crashes the Mosaic compiler
    ws2d = (dy_scale.astype(jnp.float32)[:, None] if has_scale
            else jnp.zeros((8, 1), jnp.float32))
    # index maps take trailing *_ so the same specs serve the 1- and
    # 2-scalar-prefetch (defer_dw / tile_perm) grids; ``_row`` resolves the
    # row-tile index through the permutation when one is given
    if tile_perm is None:
        _row = lambda i, *_: i  # noqa: E731
    else:
        _row = lambda i, p, *_: p[i]  # noqa: E731
    ws_spec = (pl.BlockSpec((tile, 1), lambda hh, i, e, *s: (_row(i, *s), 0))
               if has_scale
               else pl.BlockSpec((8, 1), lambda hh, i, e, *_: (0, 0)))
    row_d = pl.BlockSpec((1, tile, D),
                         lambda hh, i, e, *s: (hh, _row(i, *s), 0))
    in_specs = [
        pl.BlockSpec((tile, D), lambda hh, i, e, *s: (_row(i, *s), 0)),
        pl.BlockSpec((tile, D), lambda hh, i, e, *s: (_row(i, *s), 0)),
        pl.BlockSpec((1, D, H2), lambda hh, i, e, *_: (e[i], 0, hh)),
        pl.BlockSpec((1, 1, H2), lambda hh, i, e, *_: (e[i], 0, hh)),
        pl.BlockSpec((1, H2, D), lambda hh, i, e, *_: (e[i], hh, 0)),
        ws_spec,
    ]
    out_specs = [
        row_d,                                                   # dx part
        pl.BlockSpec((1, D, H2), lambda hh, i, e, *_: (e[i], 0, hh)),
        pl.BlockSpec((1, 1, H2), lambda hh, i, e, *_: (e[i], 0, hh)),
        pl.BlockSpec((1, H2, D), lambda hh, i, e, *_: (e[i], hh, 0)),
        pl.BlockSpec((1, 1, 1, D), lambda hh, i, e, *_: (hh, e[i], 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((2, Tp, D), xs.dtype),
        jax.ShapeDtypeStruct((E, D, H), jnp.float32),
        jax.ShapeDtypeStruct((E, 1, H), jnp.float32),
        jax.ShapeDtypeStruct((E, H, D), jnp.float32),
        jax.ShapeDtypeStruct((2, E, 1, D), jnp.float32),
    ]
    if defer_dw:
        assert tile == TILE_ROWS, "defer_dw pairs TILE_ROWS tiles"
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(2, n_tiles),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((2 * tile, D), xs.dtype),    # x pair
                pltpu.VMEM((2 * tile, H2), xs.dtype),   # dh pair
                pltpu.VMEM((2 * tile, H2), xs.dtype),   # g pair
                pltpu.VMEM((2 * tile, D), xs.dtype),    # dy pair
            ],
        )
        dxp, dw1, db1, dw2, db2 = pl.pallas_call(
            functools.partial(_bwd_kernel_defer,
                              gelu_pair=_gelu_pair_fn(xs.dtype),
                              has_scale=has_scale, tile=tile),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=_interpret(),
        )(e_of_tile, _bwd_flags(e_of_tile, n_tiles), dy, xs, w1, b1[:, None],
          w2, ws2d)
        dx = dxp[0] + dxp[1]
        return dx, dw1, db1[:, 0], dw2, db2[0, :, 0]
    scalars = ((e_of_tile,) if tile_perm is None
               else (e_of_tile, tile_perm))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(2, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    kernel = functools.partial(_bwd_kernel, gelu_pair=_gelu_pair_fn(xs.dtype),
                               has_scale=has_scale)
    if tile_perm is not None:
        base = kernel
        kernel = lambda e_ref, p_ref, *rest: base(e_ref, *rest)  # noqa: E731
    dxp, dw1, db1, dw2, db2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*scalars, dy, xs, w1, b1[:, None], w2, ws2d)
    dx = dxp[0] + dxp[1]  # XLA fuses this add into the consumer
    return dx, dw1, db1[:, 0], dw2, db2[0, :, 0]


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_expert_ffn_vjp(layout_rows, xs, w1, b1, w2, b2, e_of_tile,
                          dy_scale):
    return _fwd(xs, w1, b1, w2, b2, e_of_tile)


def fused_expert_ffn(xs, w1, b1, w2, b2, e_of_tile, dy_scale=None,
                     layout_rows: int = TILE_ROWS):
    """fc2(GELU(fc1(xs))) with per-tile expert weights.

    Args:
        xs: (Tp, D) tokens, sorted by expert, groups TILE_ROWS-aligned,
            Tp a multiple of TILE_ROWS.
        w1/b1/w2/b2: (E, D, H) / (E, H) / (E, H, D) / (E, D).
        e_of_tile: (Tp // TILE_ROWS,) int32 — owning expert of each row tile.
        dy_scale: optional (Tp,) per-row factor applied to the incoming
            cotangent in backward (the combine weights, 0 at padding slots) —
            lets the combine VJP hand over a raw row gather. NON-differentiable
            by contract: stop_gradient is applied here so a caller passing
            live combine weights gets an explicitly severed tangent (the VJP
            returns zero for this slot), never silently-wrong gradients.
        layout_rows: the alignment the caller's layout actually guarantees
            (static). When >= LAYOUT_ROWS the backward runs LAYOUT_ROWS-row
            tiles — measured 2.307 -> 2.02 ms/block at the flagship shape.
            When the claim is only TILE_ROWS but ``e_of_tile`` is a
            trace-time constant whose adjacent tiles pair up (capacity
            dispatch: equal static per-expert regions with an even tile
            count, e.g. the flagship's 50 tiles/expert), the LAYOUT_ROWS
            backward is enabled automatically — the bigger-tile
            dw-accumulate win WITHOUT the +4.4% layout padding that made a
            512-row *layout* a net zero end-to-end. Checked here, before
            the custom_vjp boundary (residuals are tracers in backward).
    Returns:
        (Tp, D) in xs.dtype.
    """
    if dy_scale is not None:
        dy_scale = jax.lax.stop_gradient(dy_scale)
    if (layout_rows % LAYOUT_ROWS != 0
            and xs.shape[0] % LAYOUT_ROWS == 0
            and not isinstance(e_of_tile, jax.core.Tracer)):
        gv = np.asarray(e_of_tile).reshape(-1, LAYOUT_ROWS // TILE_ROWS)
        if bool((gv == gv[:, :1]).all()):
            layout_rows = LAYOUT_ROWS
    return _fused_expert_ffn_vjp(layout_rows, xs, w1, b1, w2, b2, e_of_tile,
                                 dy_scale)


# ---------------------------------------------------------------------------
# gather-in-kernel variant (VERDICT r3 #3c): the dispatch row gather rides the
# kernel's own DMA instead of a separate XLA gather op
# ---------------------------------------------------------------------------
#
# The standalone dispatch gathers run at ~60% of HBM peak and cost ~10.5
# ms/step at the flagship shape (r3 trace); every standalone alternative
# (split gathers, Pallas row gather/scatter, per-row DMA *kernels*) measured
# equal or slower because the random 768 B row reads are latency-bound. Here
# the same per-row DMAs are issued INSIDE the FFN kernel, double-buffered one
# row tile ahead, so their latency hides under the tile's GEMMs (the kernel
# runs ~80% MXU). xs is never materialized in HBM: the forward saves its
# write (~2.3 ms) and read, the backward re-gathers (same read the
# materialized xs would cost).
#
# STATUS (r4, real v5e): NOT LOWERABLE on the current libtpu. Mosaic
# requires slices of a tiled HBM memref to be 8-sublane-aligned along the
# sliced dim ("Slice shape along dimension 0 must be aligned to tiling (8),
# but is 1") — a single-row x_hbm.at[src] DMA is exactly a 1-row slice.
# No escape at D=384: every (T, 8k, 128m) reshape that would make the row
# its own leading index pads 384 -> >=1024 elements/row (>=2.7x HBM traffic,
# worse than the 60%-of-peak XLA gather), and 1-D flattening needs
# 256-element (bf16) offset alignment that 384-element rows break on odd
# rows. The code is kept for a future libtpu with unaligned-DMA support;
# correctness holds in interpret mode (tests/test_fused_ffn.py). The env
# knob SSMV_GATHER_IN_KERNEL therefore stays OFF in production.


def _gather_tile_dma(x_hbm, g_ref, xbuf, sems, tile_idx, slot,
                     tile=TILE_ROWS):
    """Issue (start=True) or retire (start=False) the ``tile`` row copies
    of layout tile ``tile_idx`` into ``xbuf[slot]``."""

    def op(start):
        def body(r, _):
            src = g_ref[tile_idx * tile + r]
            dma = pltpu.make_async_copy(
                x_hbm.at[src], xbuf.at[slot, r], sems.at[slot])
            if start:
                dma.start()
            else:
                dma.wait()
            return _

        # Mosaic's loop lowering only supports unroll=1 or full unroll
        # (partial unroll=8 raised NotImplementedError on real TPU, r4);
        # fully unroll — 256 straight-line DMA starts from the scalar core,
        # no loop-carry overhead.
        jax.lax.fori_loop(0, tile, body, None, unroll=tile)

    return op


def _fwd_gather_kernel(e_ref, g_ref, x_hbm, w1_ref, b1_ref, w2_ref, b2_ref,
                       y_ref, xbuf, sems, *, gelu, n_tiles):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():  # prologue: this tile's rows were not prefetched by anyone
        _gather_tile_dma(x_hbm, g_ref, xbuf, sems, 0, 0)(start=True)

    @pl.when(i + 1 < n_tiles)
    def _():  # prefetch the next tile's rows while this tile computes
        _gather_tile_dma(x_hbm, g_ref, xbuf, sems, i + 1, (i + 1) % 2)(
            start=True)

    _gather_tile_dma(x_hbm, g_ref, xbuf, sems, i, i % 2)(start=False)
    x = xbuf[i % 2]
    h = jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32)
    h = h + b1_ref[0, 0].astype(jnp.float32)
    g = gelu(h).astype(x.dtype)
    y = jnp.dot(g, w2_ref[0], preferred_element_type=jnp.float32)
    y = y + b2_ref[0, 0].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _fwd_gather(x, gather_idx, w1, b1, w2, b2, e_of_tile):
    T, D = x.shape
    E, _, H = w1.shape
    Tp = gather_idx.shape[0]
    n_tiles = Tp // TILE_ROWS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # e_of_tile, gather_idx
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((1, D, H), lambda i, e, g: (e[i], 0, 0)),
            pl.BlockSpec((1, 1, H), lambda i, e, g: (e[i], 0, 0)),
            pl.BlockSpec((1, H, D), lambda i, e, g: (e[i], 0, 0)),
            pl.BlockSpec((1, 1, D), lambda i, e, g: (e[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, D), lambda i, e, g: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, TILE_ROWS, D), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_gather_kernel, gelu=_gelu_fns(x.dtype)[0],
                          n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, D), x.dtype),
        interpret=_interpret(),
    )(e_of_tile, gather_idx, x, w1, b1[:, None], w2, b2[:, None])


def _bwd_gather_kernel(e_ref, g_ref, dy_ref, x_hbm, w1_ref, b1_ref, w2_ref,
                       ws_ref, dxp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                       xbuf, sems, *, gelu_pair, has_scale, n_tiles, tile):
    hh = pl.program_id(0)
    i = pl.program_id(1)
    s = hh * n_tiles + i  # linear step in the (2, n_tiles) row-major grid

    @pl.when(s == 0)
    def _():
        _gather_tile_dma(x_hbm, g_ref, xbuf, sems, 0, 0, tile)(start=True)

    @pl.when(s + 1 < 2 * n_tiles)
    def _():  # the next step's tile is (s+1) % n_tiles (hh wraps, i resets)
        _gather_tile_dma(x_hbm, g_ref, xbuf, sems,
                         (s + 1) % n_tiles, (s + 1) % 2, tile)(start=True)

    _gather_tile_dma(x_hbm, g_ref, xbuf, sems, i, s % 2, tile)(start=False)
    x = xbuf[s % 2]

    first = jnp.logical_or(i == 0, e_ref[i] != e_ref[jnp.maximum(i - 1, 0)])
    dy = dy_ref[:]
    if has_scale:
        dy = dy * ws_ref[:].astype(dy.dtype)
    dhb, g, db1, db2 = _tile_dx(x, dy, w1_ref, b1_ref, w2_ref, dxp_ref,
                                gelu_pair)
    dw1 = jax.lax.dot_general(
        x, dhb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None]
    dw2 = jax.lax.dot_general(
        g, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None]
    _accumulate(first, [(dw1_ref, dw1), (db1_ref, db1), (dw2_ref, dw2),
                        (db2_ref, db2)])


def _bwd_gather(dy, x, gather_idx, w1, b1, w2, e_of_tile, dy_scale=None,
                tile=TILE_ROWS):
    T, D = x.shape
    E, _, H = w1.shape
    H2 = H // 2
    Tp = gather_idx.shape[0]
    n_tiles = Tp // tile
    if tile != TILE_ROWS:
        # same caller contract as _bwd: every ``tile`` window spans one expert
        assert tile % TILE_ROWS == 0 and Tp % tile == 0
        groups = e_of_tile.reshape(-1, tile // TILE_ROWS)
        if not isinstance(groups, jax.core.Tracer):
            gv = np.asarray(groups)
            assert (gv == gv[:, :1]).all(), (
                f"tile={tile} but a {tile}-row window spans multiple experts")
        e_of_tile = groups[:, 0]
    has_scale = dy_scale is not None
    ws2d = (dy_scale.astype(jnp.float32)[:, None] if has_scale
            else jnp.zeros((8, 1), jnp.float32))
    ws_spec = (pl.BlockSpec((tile, 1), lambda hh, i, e, g: (i, 0))
               if has_scale
               else pl.BlockSpec((8, 1), lambda hh, i, e, g: (0, 0)))
    row_d = pl.BlockSpec((1, tile, D), lambda hh, i, e, g: (hh, i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(2, n_tiles),
        in_specs=[
            pl.BlockSpec((tile, D), lambda hh, i, e, g: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((1, D, H2), lambda hh, i, e, g: (e[i], 0, hh)),
            pl.BlockSpec((1, 1, H2), lambda hh, i, e, g: (e[i], 0, hh)),
            pl.BlockSpec((1, H2, D), lambda hh, i, e, g: (e[i], hh, 0)),
            ws_spec,
        ],
        out_specs=[
            row_d,
            pl.BlockSpec((1, D, H2), lambda hh, i, e, g: (e[i], 0, hh)),
            pl.BlockSpec((1, 1, H2), lambda hh, i, e, g: (e[i], 0, hh)),
            pl.BlockSpec((1, H2, D), lambda hh, i, e, g: (e[i], hh, 0)),
            pl.BlockSpec((1, 1, 1, D), lambda hh, i, e, g: (hh, e[i], 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tile, D), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dxp, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_gather_kernel,
                          gelu_pair=_gelu_pair_fn(x.dtype),
                          has_scale=has_scale, n_tiles=n_tiles, tile=tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((2, Tp, D), x.dtype),
            jax.ShapeDtypeStruct((E, D, H), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((E, H, D), jnp.float32),
            jax.ShapeDtypeStruct((2, E, 1, D), jnp.float32),
        ],
        interpret=_interpret(),
    )(e_of_tile, gather_idx, dy, x, w1, b1[:, None], w2, ws2d)
    dx_slots = dxp[0] + dxp[1]
    return dx_slots, dw1, db1[:, 0], dw2, db2[0, :, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_expert_ffn_gather_vjp(bwd_tile, x, gather_idx, pair_slot, keep,
                                 w1, b1, w2, b2, e_of_tile, dy_scale):
    return _fwd_gather(x, gather_idx, w1, b1, w2, b2, e_of_tile)


def fused_expert_ffn_gather(x, gather_idx, pair_slot, keep, w1, b1, w2, b2,
                            e_of_tile, dy_scale=None):
    """fc2(GELU(fc1(x[gather_idx]))) with the dispatch gather fused into the
    kernel's x load — replaces the ``_dispatch_gather`` + ``fused_expert_ffn``
    pair (xs is never materialized).

    Args:
        x: (T, D) tokens (NOT expanded).
        gather_idx: (Tp,) int32 source token of each padded layout slot.
        pair_slot: (T, k) int32 slot of each (token, choice) pair — used by
            the VJP to return dx in token space with k row gathers.
        keep: (T, k) bool or None — capacity mask for the dx gathers.
        Everything else as ``fused_expert_ffn``.
    Returns:
        (Tp, D) expanded outputs, same contract as fused_expert_ffn(xs, ...).
    """
    if dy_scale is not None:
        dy_scale = jax.lax.stop_gradient(dy_scale)
    # same opportunistic backward tile-pairing as fused_expert_ffn: decided
    # here (static), because residuals are tracers in the backward
    bwd_tile = TILE_ROWS
    if (gather_idx.shape[0] % LAYOUT_ROWS == 0
            and not isinstance(e_of_tile, jax.core.Tracer)):
        gv = np.asarray(e_of_tile).reshape(-1, LAYOUT_ROWS // TILE_ROWS)
        if bool((gv == gv[:, :1]).all()):
            bwd_tile = LAYOUT_ROWS
    return _fused_expert_ffn_gather_vjp(bwd_tile, x, gather_idx, pair_slot,
                                        keep, w1, b1, w2, b2, e_of_tile,
                                        dy_scale)


def _ffn_gather_fwd(bwd_tile, x, gather_idx, pair_slot, keep, w1, b1, w2, b2,
                    e_of_tile, dy_scale):
    y = _fwd_gather(x, gather_idx, w1, b1, w2, b2, e_of_tile)
    return y, (x, gather_idx, pair_slot, keep, w1, b1, w2, b2, e_of_tile,
               dy_scale)


def _ffn_gather_bwd(bwd_tile, res, dy):
    (x, gather_idx, pair_slot, keep, w1, b1, w2, b2, e_of_tile,
     dy_scale) = res
    dy = dy.astype(x.dtype)
    dx_slots, dw1, db1, dw2, db2 = _bwd_gather(
        dy, x, gather_idx, w1, b1, w2, e_of_tile, dy_scale=dy_scale,
        tile=bwd_tile)
    # token-space dx: each token owns exactly its k slots; padding slots
    # carry zero cotangents by construction (combine weight 0)
    dx = None
    for kk in range(pair_slot.shape[1]):
        gk = jnp.take(dx_slots, pair_slot[:, kk], axis=0)
        if keep is not None:
            gk = gk * keep[:, kk:kk + 1].astype(gk.dtype)
        dx = gk if dx is None else dx + gk
    de = np.zeros(e_of_tile.shape, dtype=jax.dtypes.float0)
    dg = np.zeros(gather_idx.shape, dtype=jax.dtypes.float0)
    dp = np.zeros(pair_slot.shape, dtype=jax.dtypes.float0)
    dk = None if keep is None else np.zeros(keep.shape,
                                            dtype=jax.dtypes.float0)
    ds = None if dy_scale is None else jnp.zeros_like(dy_scale)
    return (dx, dg, dp, dk, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype), de, ds)


_fused_expert_ffn_gather_vjp.defvjp(_ffn_gather_fwd, _ffn_gather_bwd)


def _ffn_fwd(layout_rows, xs, w1, b1, w2, b2, e_of_tile, dy_scale):
    y = _fwd(xs, w1, b1, w2, b2, e_of_tile)
    return y, (xs, w1, b1, w2, b2, e_of_tile, dy_scale)


def _ffn_bwd(layout_rows, res, dy):
    xs, w1, b1, w2, b2, e_of_tile, dy_scale = res
    dy = dy.astype(xs.dtype)
    bwd_tile = (LAYOUT_ROWS if (layout_rows % LAYOUT_ROWS == 0
                                and xs.shape[0] % LAYOUT_ROWS == 0)
                else TILE_ROWS)
    # deferred-dw pairing (SSMV_DEFER_DW, trace-time): the LAYOUT_ROWS
    # dw-GEMM win for layouts that cannot promote — dynamic (dropless)
    # e_of_tile or odd per-expert tile counts. Opt-in until measured on
    # silicon; the promoted LAYOUT_ROWS path keeps priority when available.
    defer = (bwd_tile == TILE_ROWS
             and os.environ.get("SSMV_DEFER_DW", "0") == "1")
    dx, dw1, db1, dw2, db2 = _bwd(dy, xs, w1, b1, w2, e_of_tile,
                                  dy_scale=dy_scale, tile=bwd_tile,
                                  defer_dw=defer)
    de = np.zeros(e_of_tile.shape, dtype=jax.dtypes.float0)
    # zero by contract — the public wrapper stop_gradients dy_scale
    ds = None if dy_scale is None else jnp.zeros_like(dy_scale)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype), de, ds)


_fused_expert_ffn_vjp.defvjp(_ffn_fwd, _ffn_bwd)


# ---------------------------------------------------------------------------
# permuted-rows variant: the a2a EP form's expert-major iteration over
# source-major rows, without materializing a transposed copy
# ---------------------------------------------------------------------------

@jax.custom_vjp
def fused_expert_ffn_permuted(xs, w1, b1, w2, b2, e_of_step, tile_perm):
    """``fused_expert_ffn`` whose grid iterates row tiles in a caller-chosen
    order (VERDICT r4 #8 — removes the a2a EP expert-major relayout).

    STATUS: numerically exact but MEASURED 123x SLOWER than
    relayout-then-base-kernel on real Mosaic (554.9 vs 4.5 ms/iter fwd+bwd,
    49k rows, v5e r5, ``scripts/check_perm_ffn_tpu.py``) — the
    data-dependent block index maps defeat DMA prefetch, serializing tiles.
    Kept with parity tests as an experiment ledger; the a2a EP path uses the
    relayout form unless ``SSMV_A2A_PERMUTED=1``.

    Args:
        xs: (Tp, D) rows in ANY tile-interleaved order (each TILE_ROWS tile
            still single-expert).
        e_of_step: (n_tiles,) int32 — owning expert of the tile visited at
            GRID STEP i, i.e. of row tile ``tile_perm[i]``. Same-expert
            steps must be consecutive (the dw accumulate/flush contract).
        tile_perm: (n_tiles,) int32 permutation — grid step i reads row tile
            ``tile_perm[i]`` and writes the SAME tile of y, so the output
            keeps xs's row order. The permutation rides the kernel's block
            DMA via scalar-prefetch index maps; no relayout copy exists in
            either the forward or the backward.
    """
    return _fwd(xs, w1, b1, w2, b2, e_of_step, tile_perm=tile_perm)


def _ffn_perm_fwd(xs, w1, b1, w2, b2, e_of_step, tile_perm):
    y = _fwd(xs, w1, b1, w2, b2, e_of_step, tile_perm=tile_perm)
    return y, (xs, w1, b1, w2, b2, e_of_step, tile_perm)


def _ffn_perm_bwd(res, dy):
    xs, w1, b1, w2, b2, e_of_step, tile_perm = res
    dy = dy.astype(xs.dtype)
    dx, dw1, db1, dw2, db2 = _bwd(dy, xs, w1, b1, w2, e_of_step,
                                  tile_perm=tile_perm)
    de = np.zeros(e_of_step.shape, dtype=jax.dtypes.float0)
    dp = np.zeros(tile_perm.shape, dtype=jax.dtypes.float0)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype), de, dp)


fused_expert_ffn_permuted.defvjp(_ffn_perm_fwd, _ffn_perm_bwd)
