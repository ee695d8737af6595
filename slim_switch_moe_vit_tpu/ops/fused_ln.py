"""Fused residual-add + LayerNorm as single-pass Pallas TPU kernels.

The transformer residual stream alternates ``u = x + branch`` with
``y = LN(u)`` (reference block wiring ``models/vision_transformer.py:319-322``).
XLA lowers that chain as several HBM passes per instance (add fusion, stat
reduce, normalize broadcast, and in backward separate dx / dgamma / dbeta
reductions). These kernels do each direction in ONE pass over the rows:

forward:   read (x, r) once -> write (u = x + r, y = LN(u) * g + b)
backward:  read (u, dy, du_out) once -> write du; accumulate dgamma/dbeta
           in VMEM f32 across tiles (single revisited (1, D) block)

Kernels consume the model's natural (B, N, D) layout directly — an earlier
(B*N, D) host-reshape variant made XLA materialize layout copies around every
call (~1.4 ms/step at ViT-S/b128). Blocks span full (N, D) so every loaded
row is logical (no pad-row masking needed, unlike the overhanging MHA blocks).

Stats are recomputed from ``u`` in backward instead of being saved — two VPU
reductions per tile beat an HBM round-trip of per-row stats at these shapes.
Math matches ``models/layers.py::LayerNorm`` exactly (f32 stats, eps inside
rsqrt, params applied in f32, output cast back).
"""
from __future__ import annotations

import functools
import typing as typ

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_tile(rows: int) -> typ.Optional[int]:
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if rows % cand == 0:
            return cand
    return None


def _batch_tile(b: int, n: int, d: int, itemsize: int = 2) -> int:
    """Samples per grid cell, capped so the four double-buffered (G, N, D)
    operand blocks stay within scoped VMEM (at 384px/N=577, G=8 was a hard
    compile OOM: 20.5M vs the 16M limit).

    G=1 was tried r3 for small D (a dot->LN->dot microchain measured it 23%
    faster at (256,197,192), suggesting the {2,0,1} operand layout of G>1
    blocks caused the per-block layout copy) — but IN-MODEL it ran the norm
    total 1.99 -> 3.54 ms/forward and the copy remained (the microchain's
    consumer pattern differs). Keep the VMEM-bounded G.

    The budget must count the KERNEL STACK, not just the operand blocks: the
    backward keeps ~6 live (G, N, D) f32 temporaries (u32, dy, d, xhat, dyg,
    du), which at G=8/(197,384) is ~18M scoped — over the 16M limit whenever
    Mosaic's liveness scheduling doesn't collapse them (r3: the ViT-S compact
    model hit exactly this as a compile OOM while the parity model squeaked
    by). 6*G*N*D*4 (stack) + 4*G*N*D*2*itemsize (double-buffered operand
    blocks) <= 13M keeps a margin."""
    per_sample = 6 * n * d * 4 + 4 * n * d * itemsize * 2
    for cand in (8, 4, 2):
        if b % cand == 0 and cand * per_sample <= 13 * 2 ** 20:
            return cand
    return 1


def supported(x) -> bool:
    """True if the fused kernels can tile this activation tensor."""
    if x.ndim == 3:
        return True  # block (G, N, D) spans full (N, D)
    return x.ndim == 2 and _row_tile(x.shape[0]) is not None


def profitable(x) -> bool:
    """True where the fused kernels measured FASTER than XLA LN — the
    'auto' policy. Measured r4 (real v5e, scripts/bench_ln_layout_r4.py +
    /tmp/ln_flagship.log): at D=192 (deit-tiny b256 eval) Mosaic pads the
    lane dim to 256 (+33% VPU/VMEM waste) and XLA inserts a
    {2,1,0}->{2,0,1} layout copy on the pallas operand — plain XLA LN runs
    19% faster (10.36 vs 12.36 ms/fwd). At D=384 (ViT-S flagship train)
    the fused kernel keeps its win (83.19 vs 85.74 ms/step). So: fused only
    at lane-aligned channel widths; explicit impl='fused' still forces the
    kernel at any supported shape (benchmarks re-measure the trade)."""
    return x.shape[-1] % 128 == 0


def _specs(shape, itemsize: int = 2):
    """(grid, row-block spec, vec spec) for a (B, N, D) or (rows, D) array."""
    if len(shape) == 3:
        B, N, D = shape
        G = _batch_tile(B, N, D, itemsize)
        return ((B // G,),
                pl.BlockSpec((G, N, D), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, D), lambda i: (0, 0)))
    rows, D = shape
    tile = _row_tile(rows)
    return ((rows // tile,),
            pl.BlockSpec((tile, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _ln_core(u, g_ref, b_ref, eps):
    u32 = u.astype(jnp.float32)
    mean = jnp.mean(u32, axis=-1, keepdims=True)
    d = u32 - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    xhat = d * jax.lax.rsqrt(var + eps)
    return xhat * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)


def _fwd_kernel_add(x_ref, r_ref, g_ref, b_ref, u_ref, y_ref, *, eps):
    u = x_ref[:] + r_ref[:]
    u_ref[:] = u
    y_ref[:] = _ln_core(u, g_ref, b_ref, eps).astype(y_ref.dtype)


def _fwd_kernel_noadd(x_ref, g_ref, b_ref, y_ref, *, eps):
    y_ref[:] = _ln_core(x_ref[:], g_ref, b_ref, eps).astype(y_ref.dtype)


def _fwd(x, r, gamma, beta, eps):
    grid, row_spec, vec_spec = _specs(x.shape, x.dtype.itemsize)
    if r is None:
        y = pl.pallas_call(
            functools.partial(_fwd_kernel_noadd, eps=eps),
            grid=grid,
            in_specs=[row_spec, vec_spec, vec_spec],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=_interpret(),
        )(x, gamma[None], beta[None])
        return x, y
    u, y = pl.pallas_call(
        functools.partial(_fwd_kernel_add, eps=eps),
        grid=grid,
        in_specs=[row_spec, row_spec, vec_spec, vec_spec],
        out_specs=[row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)],
        interpret=_interpret(),
    )(x, r, gamma[None], beta[None])
    return u, y


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _col_axes(ndim):
    return tuple(range(ndim - 1))


def _bwd_kernel(u_ref, dy_ref, du_out_ref, g_ref, du_ref, dg_ref, db_ref, *,
                eps, has_du_out):
    i = pl.program_id(0)
    u32 = u_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    mean = jnp.mean(u32, axis=-1, keepdims=True)
    d = u32 - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = d * rstd
    dyg = dy * g_ref[0].astype(jnp.float32)
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    du = (dyg - m1 - xhat * m2) * rstd
    if has_du_out:
        du = du + du_out_ref[:].astype(jnp.float32)
    du_ref[:] = du.astype(du_ref.dtype)
    axes = _col_axes(dy.ndim)
    dg = jnp.sum(dy * xhat, axis=axes)[None]
    db = jnp.sum(dy, axis=axes)[None]

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg
        db_ref[:] = db

    @pl.when(i != 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg
        db_ref[:] = db_ref[:] + db


def _bwd(u, dy, du_out, gamma, eps):
    D = u.shape[-1]
    grid, row_spec, vec_spec = _specs(u.shape, u.dtype.itemsize)
    has_du_out = du_out is not None
    du, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, has_du_out=has_du_out),
        grid=grid,
        in_specs=[row_spec, row_spec,
                  row_spec if has_du_out else vec_spec, vec_spec],
        out_specs=[row_spec, vec_spec, vec_spec],
        out_shape=[jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32)],
        interpret=_interpret(),
    )(u, dy, du_out if has_du_out else gamma[None], gamma[None])
    return du, dg[0], db[0]


# ---------------------------------------------------------------------------
# public ops with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_add_ln(x, r, gamma, beta, eps: float = 1e-6):
    """(u, y) = (x + r, LayerNorm(x + r) * gamma + beta), one pass each way.

    Args:
        x, r: (..., D) residual stream + branch (same shape/dtype; 2-D or 3-D).
        gamma, beta: (D,) f32 affine params.
    Returns:
        u: the new residual stream (x + r).
        y: the normalized output.
    """
    return _fwd(x, r, gamma, beta, eps)


def _add_ln_fwd(x, r, gamma, beta, eps):
    u, y = _fwd(x, r, gamma, beta, eps)
    return (u, y), (u, gamma)


def _add_ln_bwd(eps, res, cots):
    u, gamma = res
    du_out, dy = cots
    du, dg, db = _bwd(u, dy.astype(u.dtype), du_out.astype(u.dtype),
                      gamma, eps)
    return du, du, dg, db


fused_add_ln.defvjp(_add_ln_fwd, _add_ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_ln(x, gamma, beta, eps: float = 1e-6):
    """y = LayerNorm(x) * gamma + beta in one HBM pass (no residual add)."""
    return _fwd(x, None, gamma, beta, eps)[1]


def _ln_fwd(x, gamma, beta, eps):
    return _fwd(x, None, gamma, beta, eps)[1], (x, gamma)


def _ln_bwd(eps, res, dy):
    x, gamma = res
    dx, dg, db = _bwd(x, dy.astype(x.dtype), None, gamma, eps)
    return dx, dg, db


fused_ln.defvjp(_ln_fwd, _ln_bwd)


# ---------------------------------------------------------------------------
# slim variant: y = LN(a + b) with the sum NOT emitted (the ResMoE blocks and
# the final norm never read the raw sum — reference resMoE.py:126-145 norms
# straight through the residual). Backward recomputes the sum from (a, b).
# ---------------------------------------------------------------------------

def _fwd_kernel_slim(a_ref, b_ref, g_ref, b2_ref, y_ref, *, eps):
    y_ref[:] = _ln_core(a_ref[:] + b_ref[:], g_ref, b2_ref,
                        eps).astype(y_ref.dtype)


def _bwd_kernel_slim(a_ref, b_ref, dy_ref, g_ref, du_ref, dg_ref, db_ref, *,
                     eps):
    i = pl.program_id(0)
    u32 = (a_ref[:] + b_ref[:]).astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    mean = jnp.mean(u32, axis=-1, keepdims=True)
    d = u32 - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = d * rstd
    dyg = dy * g_ref[0].astype(jnp.float32)
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    du = (dyg - m1 - xhat * m2) * rstd
    du_ref[:] = du.astype(du_ref.dtype)
    axes = _col_axes(dy.ndim)
    dg = jnp.sum(dy * xhat, axis=axes)[None]
    db = jnp.sum(dy, axis=axes)[None]

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg
        db_ref[:] = db

    @pl.when(i != 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg
        db_ref[:] = db_ref[:] + db


def _slim_fwd_impl(a, b, gamma, beta, eps):
    grid, row_spec, vec_spec = _specs(a.shape, a.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_slim, eps=eps),
        grid=grid,
        in_specs=[row_spec, row_spec, vec_spec, vec_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        interpret=_interpret(),
    )(a, b, gamma[None], beta[None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_sum_ln(a, b, gamma, beta, eps: float = 1e-6):
    """y = LayerNorm(a + b) * gamma + beta; the sum itself is never
    materialized in HBM (backward recomputes it from the saved addends)."""
    return _slim_fwd_impl(a, b, gamma, beta, eps)


def _sum_ln_fwd(a, b, gamma, beta, eps):
    return _slim_fwd_impl(a, b, gamma, beta, eps), (a, b, gamma)


def _sum_ln_bwd(eps, res, dy):
    a, b, gamma = res
    D = a.shape[-1]
    grid, row_spec, vec_spec = _specs(a.shape, a.dtype.itemsize)
    du, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel_slim, eps=eps),
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, vec_spec],
        out_specs=[row_spec, vec_spec, vec_spec],
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32)],
        interpret=_interpret(),
    )(a, b, dy.astype(a.dtype), gamma[None])
    return du, du, dg[0], db[0]


fused_sum_ln.defvjp(_sum_ln_fwd, _sum_ln_bwd)


def reference_add_ln(x, r, gamma, beta, eps: float = 1e-6):
    """Unfused oracle (same math as models.layers.LayerNorm) for tests."""
    u = x + r if r is not None else x
    u32 = u.astype(jnp.float32)
    mean = jnp.mean(u32, axis=-1, keepdims=True)
    d = u32 - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    y = d * jax.lax.rsqrt(var + eps) * gamma + beta
    return u, y.astype(x.dtype)
