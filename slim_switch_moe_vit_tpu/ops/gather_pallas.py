"""Pallas row gather / scatter-add — EXPERIMENTAL, not wired into the model.

Status: CORRECT on hardware and in the interpreter (an earlier wrong-values
report was a slab-divisibility bug in the grid, since fixed), but slower than
the XLA primitives at MoE sizes: gather 5.0 ms vs `jnp.take` 1.26 ms, scatter
4.5 ms vs `.at[].add` 1.39 ms (50k x 384 bf16 rows). The masked 8-row-tile
extraction costs ~16 VPU ops per row; XLA's row ops run ~30 GB/s — both far
from the ~300 GB/s streaming bound. The real win is fusing the gather into
the expert GEMM (megablocks-style, rows read once from HBM as GEMM operands) —
these kernels are the staging point for that. The model's MoE path uses XLA
gathers meanwhile.

Design notes: the FastMoE CUDA `local_exchange` analog. Source table lives
VMEM-resident (slabbed over features); Mosaic requires dynamic sublane indices
provably 8-aligned, so rows are moved via aligned 8-row tiles + masked sublane
reductions (`pl.multiple_of` supplies the alignment proof).

- ``gather_rows(x, idx)``: out[i] = x[idx[i]]; differentiable (backward is the
  scatter-add kernel).
- ``scatter_add_rows(g, idx, num_rows)``: out[idx[i]] += g[i] — gather's
  transpose.

Grid layout: feature slabs are the MAJOR grid dim and row blocks the minor
one, so the VMEM-resident table/accumulator block is revisited (not refetched)
across consecutive row-block steps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FEATURE_SLAB = 256  # columns per grid step; keeps the x slab <= ~13MB VMEM


def _round_up(a, m):
    return (a + m - 1) // m * m


def _gather_kernel(idx_ref, x_ref, o_ref):
    """Grid cell (j: feature slab, i: row block). x_ref: (N, slab) VMEM slab;
    o_ref: (block_m, slab); idx_ref: full (M,) scalar-prefetch.

    Mosaic requires dynamic sublane indices provably 8-aligned, so each source
    row is fetched as its aligned 8-row tile and extracted with a masked
    sublane reduction (vectorized on the VPU).
    """
    i = pl.program_id(1)
    block_m, slab = o_ref.shape
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, slab), 0)

    def group(g, _):
        # build one aligned 8-row output tile from 8 arbitrary source rows
        def one(p, acc):
            src = idx_ref[i * block_m + g * 8 + p]
            base = pl.multiple_of((src // 8) * 8, 8)
            tile = x_ref[pl.ds(base, 8), :].astype(jnp.float32)
            phase = src - base
            row = jnp.sum(jnp.where(sub == phase, tile, 0.0), axis=0)
            return acc + jnp.where(sub == p, row[None, :], 0.0)

        acc = jax.lax.fori_loop(0, 8, one, jnp.zeros((8, slab), jnp.float32))
        o_ref[pl.ds(pl.multiple_of(g * 8, 8), 8), :] = acc.astype(o_ref.dtype)
        return ()

    jax.lax.fori_loop(0, block_m // 8, group, ())


def _scatter_add_kernel(idx_ref, g_ref, o_ref):
    """Grid cell (j: feature slab, i: row block). o_ref: (rows_pad, slab)
    accumulator, revisited across i; g_ref: (block_m, slab). Aligned-tile
    read-modify-write with a sublane mask (see gather kernel)."""
    i = pl.program_id(1)
    block_m, slab = g_ref.shape
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, slab), 0)

    @pl.when(i == 0)
    def _():
        o_ref[:, :] = jnp.zeros_like(o_ref)

    def group(g, _):
        gtile = g_ref[pl.ds(pl.multiple_of(g * 8, 8), 8), :].astype(
            jnp.float32)

        def one(p, _):
            dst = idx_ref[i * block_m + g * 8 + p]
            base = pl.multiple_of((dst // 8) * 8, 8)
            phase = dst - base
            # extract source row p from gtile, add into dst row of its tile
            row = jnp.sum(jnp.where(sub == p, gtile, 0.0), axis=0)
            tile = o_ref[pl.ds(base, 8), :]
            tile = tile + jnp.where(sub == phase, row[None, :], 0.0).astype(
                tile.dtype)
            o_ref[pl.ds(base, 8), :] = tile
            return ()

        jax.lax.fori_loop(0, 8, one, ())
        return ()

    jax.lax.fori_loop(0, block_m // 8, group, ())


def _gather_impl(x, idx, block_m=1024, interpret=False):
    N, D = x.shape
    M = idx.shape[0]
    m_pad = _round_up(M, block_m)
    d_pad = _round_up(D, 128)
    # slab must divide d_pad or the grid silently skips columns
    slab = FEATURE_SLAB if d_pad % FEATURE_SLAB == 0 else 128
    n_pad = _round_up(N, 8)
    x_p = jnp.pad(x, ((0, n_pad - N), (0, d_pad - D)))
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, m_pad - M))

    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(d_pad // slab, m_pad // block_m),
            in_specs=[
                pl.BlockSpec((n_pad, slab), lambda j, i, *_: (0, j)),
            ],
            out_specs=pl.BlockSpec((block_m, slab), lambda j, i, *_: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, d_pad), x.dtype),
        interpret=interpret,
    )(idx_p, x_p)
    return out[:M, :D]


def _scatter_add_impl(g, idx, num_rows, block_m=1024, interpret=False):
    M, D = g.shape
    m_pad = _round_up(M, block_m)
    d_pad = _round_up(D, 128)
    # slab must divide d_pad or the grid silently skips columns
    slab = FEATURE_SLAB if d_pad % FEATURE_SLAB == 0 else 128
    rows_pad = _round_up(num_rows + 1, 8)  # +1 dump row for padded entries
    g_p = jnp.pad(g, ((0, m_pad - M), (0, d_pad - D)))
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, m_pad - M),
                    constant_values=num_rows)

    out = pl.pallas_call(
        _scatter_add_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(d_pad // slab, m_pad // block_m),
            in_specs=[
                pl.BlockSpec((block_m, slab), lambda j, i, *_: (i, j)),
            ],
            out_specs=pl.BlockSpec((rows_pad, slab), lambda j, i, *_: (0, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((rows_pad, d_pad), g.dtype),
        interpret=interpret,
    )(idx_p, g_p)
    return out[:num_rows, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def gather_rows(x, idx):
    """out[i] = x[idx[i]] — TPU-fast row gather, differentiable in x."""
    return _gather_impl(x, idx)


def _gr_fwd(x, idx):
    return _gather_impl(x, idx), (idx, x.shape[0])


def _gr_bwd(res, g):
    idx, n = res
    return scatter_add_rows(g, idx, n), None


gather_rows.defvjp(_gr_fwd, _gr_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def scatter_add_rows(g, idx, num_rows: int):
    """out[idx[i]] += g[i] over zeros((num_rows, D)) — gather's transpose."""
    return _scatter_add_impl(g, idx, num_rows)


def _sa_fwd(g, idx, num_rows):
    return _scatter_add_impl(g, idx, num_rows), idx


def _sa_bwd(num_rows, res, grad_out):
    idx = res
    return gather_rows(grad_out, idx), None


scatter_add_rows.defvjp(_sa_fwd, _sa_bwd)
