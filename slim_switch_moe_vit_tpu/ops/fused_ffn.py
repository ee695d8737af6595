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

Backward is a custom VJP with three more kernels:
- dgrad: recomputes h = x@w1+b1 (cheaper than saving h: one extra tile GEMM
  vs a 155 MB/block HBM round-trip), computes dx = ((dy@w2^T)*gelu'(h))@w1^T,
  and spills dh and g=gelu(h) as bf16 (streams at full HBM bandwidth).
- wgrad x2: single-dot kernels over the spills (dw1 = x^T@dh, dw2 = g^T@dy)
  accumulating dw/db in VMEM f32 across each expert's consecutive tiles,
  spilling once per expert. (Recomputing h in both wgrad halves instead was
  measured at ~2.6 ms/block — compute-bound on the duplicated GEMMs.)
"""
from __future__ import annotations

import functools
import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 256    # layout alignment + fwd/wgrad row tile
DGRAD_TILE = 128   # dgrad carries two (rows, H) spill blocks -> smaller tile
                   # (256 rows puts it 76 KB over the 16 MiB VMEM budget)

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


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(e_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    h = jnp.dot(x_ref[:], w1_ref[0], preferred_element_type=jnp.float32)
    h = h + b1_ref[0, 0].astype(jnp.float32)
    g = _gelu(h).astype(x_ref.dtype)
    y = jnp.dot(g, w2_ref[0], preferred_element_type=jnp.float32)
    y = y + b2_ref[0, 0].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _fwd(xs, w1, b1, w2, b2, e_of_tile):
    Tp, D = xs.shape
    E, _, H = w1.shape
    n_tiles = Tp // TILE_ROWS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, D), lambda i, e: (i, 0)),
            pl.BlockSpec((1, D, H), lambda i, e: (e[i], 0, 0)),
            pl.BlockSpec((1, 1, H), lambda i, e: (e[i], 0, 0)),
            pl.BlockSpec((1, H, D), lambda i, e: (e[i], 0, 0)),
            pl.BlockSpec((1, 1, D), lambda i, e: (e[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, D), lambda i, e: (i, 0)),
    )
    return pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, D), xs.dtype),
        interpret=_interpret(),
    )(e_of_tile, xs, w1, b1[:, None], w2, b2[:, None])


# ---------------------------------------------------------------------------
# backward: dx
# ---------------------------------------------------------------------------

def _dgrad_kernel(e_ref, dy_ref, x_ref, w1_ref, b1_ref, w2_ref,
                  dx_ref, dh_ref, g_ref):
    h = jnp.dot(x_ref[:], w1_ref[0], preferred_element_type=jnp.float32)
    h = h + b1_ref[0, 0].astype(jnp.float32)
    # dh = (dy @ w2^T) * gelu'(h)
    dyh = jax.lax.dot_general(
        dy_ref[:], w2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = (dyh * _dgelu(h)).astype(x_ref.dtype)
    dx = jax.lax.dot_general(
        dh, w1_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)
    # spill dh and g = gelu(h) so the wgrad kernels are single dots without
    # the h recompute (wgrad recompute measured ~1.3 ms/half/block; these two
    # bf16 spills stream at full HBM bandwidth instead)
    dh_ref[:] = dh
    g_ref[:] = _gelu(h).astype(g_ref.dtype)


def _dgrad(dy, xs, w1, b1, w2, e_of_tile):
    Tp, D = xs.shape
    E, _, H = w1.shape
    # finer tile than the layout alignment: each DGRAD_TILE chunk still has a
    # single owning expert because groups are TILE_ROWS(>=DGRAD_TILE)-aligned
    reps = TILE_ROWS // DGRAD_TILE
    e_fine = jnp.repeat(e_of_tile, reps) if reps > 1 else e_of_tile
    n_tiles = Tp // DGRAD_TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((DGRAD_TILE, D), lambda i, e: (i, 0)),
            pl.BlockSpec((DGRAD_TILE, D), lambda i, e: (i, 0)),
            pl.BlockSpec((1, D, H), lambda i, e: (e[i], 0, 0)),
            pl.BlockSpec((1, 1, H), lambda i, e: (e[i], 0, 0)),
            pl.BlockSpec((1, H, D), lambda i, e: (e[i], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((DGRAD_TILE, D), lambda i, e: (i, 0)),
            pl.BlockSpec((DGRAD_TILE, H), lambda i, e: (i, 0)),
            pl.BlockSpec((DGRAD_TILE, H), lambda i, e: (i, 0)),
        ],
    )
    return pl.pallas_call(
        _dgrad_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, D), xs.dtype),
            jax.ShapeDtypeStruct((Tp, H), xs.dtype),
            jax.ShapeDtypeStruct((Tp, H), xs.dtype),
        ],
        interpret=_interpret(),
    )(e_fine, dy, xs, w1, b1[:, None], w2)


# ---------------------------------------------------------------------------
# backward: dw / db (accumulated in VMEM across each expert's tiles)
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


def _wgrad1_kernel(e_ref, x_ref, dh_ref, dw1_ref, db1_ref):
    i = pl.program_id(0)
    first = jnp.logical_or(i == 0, e_ref[i] != e_ref[jnp.maximum(i - 1, 0)])
    dh = dh_ref[:]
    dw1 = jax.lax.dot_general(  # x^T @ dh -> (D, H)
        x_ref[:], dh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None]
    db1 = jnp.sum(dh.astype(jnp.float32), axis=0)[None, None]
    _accumulate(first, [(dw1_ref, dw1), (db1_ref, db1)])


def _wgrad2_kernel(e_ref, g_ref, dy_ref, dw2_ref, db2_ref):
    i = pl.program_id(0)
    first = jnp.logical_or(i == 0, e_ref[i] != e_ref[jnp.maximum(i - 1, 0)])
    dw2 = jax.lax.dot_general(  # g^T @ dy -> (H, D)
        g_ref[:], dy_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None]
    db2 = jnp.sum(dy_ref[:].astype(jnp.float32), axis=0)[None, None]
    _accumulate(first, [(dw2_ref, dw2), (db2_ref, db2)])


def _wgrad(dy, xs, dh, g, e_of_tile, E):
    """Two single-dot pallas_calls (dw1+db1, dw2+db2) over the dh/g spills
    from dgrad. A single fused kernel holding both f32 weight accumulators
    double-buffered exceeds the 16 MiB VMEM budget at d=384/h=1536."""
    Tp, D = xs.shape
    H = dh.shape[1]
    n_tiles = Tp // TILE_ROWS

    row_d = pl.BlockSpec((TILE_ROWS, D), lambda i, e: (i, 0))
    row_h = pl.BlockSpec((TILE_ROWS, H), lambda i, e: (i, 0))

    dw1, db1 = pl.pallas_call(
        _wgrad1_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[row_d, row_h],
            out_specs=[
                pl.BlockSpec((1, D, H), lambda i, e: (e[i], 0, 0)),
                pl.BlockSpec((1, 1, H), lambda i, e: (e[i], 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((E, D, H), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(e_of_tile, xs, dh)

    dw2, db2 = pl.pallas_call(
        _wgrad2_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[row_h, row_d],
            out_specs=[
                pl.BlockSpec((1, H, D), lambda i, e: (e[i], 0, 0)),
                pl.BlockSpec((1, 1, D), lambda i, e: (e[i], 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((E, H, D), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, D), jnp.float32),
        ],
        interpret=_interpret(),
    )(e_of_tile, g, dy)
    return dw1, db1[:, 0], dw2, db2[:, 0]


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@jax.custom_vjp
def fused_expert_ffn(xs, w1, b1, w2, b2, e_of_tile):
    """fc2(GELU(fc1(xs))) with per-tile expert weights.

    Args:
        xs: (Tp, D) tokens, sorted by expert, groups 128-row aligned,
            Tp a multiple of 128.
        w1/b1/w2/b2: (E, D, H) / (E, H) / (E, H, D) / (E, D).
        e_of_tile: (Tp // 128,) int32 — owning expert of each row tile.
    Returns:
        (Tp, D) in xs.dtype.
    """
    return _fwd(xs, w1, b1, w2, b2, e_of_tile)


def _ffn_fwd(xs, w1, b1, w2, b2, e_of_tile):
    y = _fwd(xs, w1, b1, w2, b2, e_of_tile)
    return y, (xs, w1, b1, w2, e_of_tile)


def _ffn_bwd(res, dy):
    xs, w1, b1, w2, e_of_tile = res
    dy = dy.astype(xs.dtype)
    dx, dh, g = _dgrad(dy, xs, w1, b1, w2, e_of_tile)
    dw1, db1, dw2, db2 = _wgrad(dy, xs, dh, g, e_of_tile, w1.shape[0])
    de = np.zeros(e_of_tile.shape, dtype=jax.dtypes.float0)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b1.dtype), de)


fused_expert_ffn.defvjp(_ffn_fwd, _ffn_bwd)
