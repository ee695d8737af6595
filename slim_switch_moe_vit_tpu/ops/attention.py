"""Pallas attention kernels for TPU.

The reference's attention is cuDNN/cuBLAS via torch (``models/
vision_transformer.py:260-280``: qkv GEMM, softmax(QK^T)V). Two kernels here:

1. ``fused_mha`` — the PRODUCTION path for ViT lengths (default on TPU for
   N <= 1024): fused forward AND backward over the packed (B, N, 3C) qkv
   tensor, one grid cell per sample group, d(qkv) emitted directly in packed
   layout (see the section comment above ``_mha_fwd_kernel``). Measured on
   v5e: ~1.5x the XLA path in-model at N=197 (ViT-S b128), 2.2x fwd / 2.0x
   bwd at N=577 (384px b64) — ``scripts/bench_mha_variants.py``.

2. ``flash_attention`` — a classic online-softmax streaming kernel, opt-in
   (``use_flash``): per (batch*head, q-block) grid cell the K/V loop keeps
   scores in VMEM, never materializing the (N, N) matrix in HBM. Its value
   is the O(N) memory footprint for serving-length sequences; at ViT lengths
   the XLA path is faster (0.94 vs 1.22 ms at N=197 — d=64 pads to the
   128-lane MXU width). Its backward recomputes with the XLA oracle
   (correctness-first; fused_mha is the trained path).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _flash_kernel(n_valid_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                  scale: float):
    """One (bh, q_block) cell: online softmax over all k blocks.

    q_ref: (block_q, d); k_ref/v_ref: (N_pad, d); o_ref: (block_q, d).
    n_valid: true sequence length (padding masked to -inf).
    """
    n_valid = n_valid_ref[0]
    q = q_ref[0].astype(jnp.float32) * scale
    block_q, d = q.shape
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col + kb * block_k < n_valid, s, -jnp.inf)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _flash_forward(q, k, v, scale, block_q=DEFAULT_BLOCK_Q,
                   block_k=DEFAULT_BLOCK_K, interpret=False):
    """q, k, v: (B, N, H, d) → (B, N, H, d)."""
    B, N, H, d = q.shape
    n_pad = _round_up(N, max(block_q, block_k))
    d_pad = _round_up(d, 128)

    def prep(x):
        x = x.transpose(0, 2, 1, 3).reshape(B * H, N, d)
        return jnp.pad(x, ((0, 0), (0, n_pad - N), (0, d_pad - d)))

    qf, kf, vf = prep(q), prep(k), prep(v)
    n_valid = jnp.full((1,), N, jnp.int32)

    grid = (B * H, n_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d_pad),
                             lambda bh, qi, *_: (bh, qi, 0)),
                pl.BlockSpec((1, n_pad, d_pad), lambda bh, qi, *_: (bh, 0, 0)),
                pl.BlockSpec((1, n_pad, d_pad), lambda bh, qi, *_: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d_pad),
                                   lambda bh, qi, *_: (bh, qi, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, n_pad, d_pad), q.dtype),
        interpret=interpret,
    )(n_valid, qf, kf, vf)
    out = out[:, :N, :d].reshape(B, H, N, d).transpose(0, 2, 1, 3)
    return out


def _xla_attention(q, k, v, scale):
    """Plain attention oracle (B, N, H, d)."""
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float = 1.0):
    """Fused attention: (B, N, H, d) x3 → (B, N, H, d)."""
    return _flash_forward(q, k, v, scale)


def _fa_fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _fa_bwd(scale, res, g):
    # correctness-first backward: differentiate the XLA oracle
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)


def flash_attention_reference(q, k, v, scale: float = 1.0):
    """Unfused oracle for tests."""
    return _xla_attention(q, k, v, scale)


# ---------------------------------------------------------------------------
# Short-sequence fused MHA over the packed qkv tensor
# ---------------------------------------------------------------------------
#
# ViT sequences are short (197 tokens at 224px, 577 at 384px): the whole
# (N, N) score matrix of one sample fits in VMEM, so no online softmax and —
# crucially — no layout change is needed. The kernel consumes the qkv GEMM's
# natural (B, N, 3C) output and emits (B, N, C) for the proj GEMM, so the
# (B,N,H,d)↔(B,H,N,d) transposes and the fp32 (B,H,N,N) HBM round-trips of
# the XLA path (~1.5 ms/block fwd+bwd at ViT-S/b128 — profiled) disappear
# entirely. Heads are a static python loop inside one grid cell per sample.
#
# N is NOT padded on the host: the N-block (256) overhangs the 197-row array,
# and Mosaic's overhang rows read garbage / drop writes, so every loaded
# operand is row-masked to zero first and score columns are masked before the
# softmax. The backward recomputes the softmax from qkv (cheaper than an HBM
# round-trip of p) and produces d(qkv) directly in packed layout.

def _round_block_n(n: int) -> int:
    # smallest bf16-tileable block covering the sequence: overhang rows cost
    # VPU time in the (nb, nb) softmax, so round to 16 sublanes, not 128
    return _round_up(n, 16)


def _mha_fwd_kernel(qkv_ref, o_ref, *, num_heads: int, scale: float, n: int):
    """Minimal-masking forward. Overhang rows (row >= n) read garbage q and
    produce garbage/nan output rows — harmless, their writes land out of
    bounds and are dropped. Overhang k COLUMNS are masked to -inf before the
    softmax (exp then yields exact 0), and overhang v rows are zeroed so a
    nan/inf bit pattern in uninitialized memory cannot poison 0*v products.

    Several samples share one grid cell (G = leading block dim): each
    (sample, head) pair is an independent dot->softmax->dot chain, and the
    unrolled loop gives the VLIW scheduler independent work to hide MXU/VPU
    latencies (the chains are individually latency-bound at ViT sizes)."""
    C = o_ref.shape[-1]
    d = C // num_heads
    G, nb = qkv_ref.shape[0], qkv_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1) < n
    for g in range(G):
        for h in range(num_heads):
            # scale folded into q: a (nb, d) multiply instead of (nb, nb)
            q = qkv_ref[g, :, h * d:(h + 1) * d].astype(jnp.float32) * scale
            k = qkv_ref[g, :, C + h * d:C + (h + 1) * d]
            v = jnp.where(row < n,
                          qkv_ref[g, :, 2 * C + h * d:2 * C + (h + 1) * d], 0)
            s = jax.lax.dot_general(
                q, k.astype(jnp.float32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            s = jnp.where(col_ok, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)                  # masked cols -> exact 0
            linv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(qkv_ref.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[g, :, h * d:(h + 1) * d] = (o * linv).astype(o_ref.dtype)


def _mha_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, num_heads: int,
                    scale: float, n: int):
    # q/k/do overhang rows are zeroed so overhang garbage cannot reach the
    # row-contracting dv/dk dots (with q,k zeroed, overhang p rows are a
    # finite exp(0-0)=1 and meet only zeroed do rows); v rows as in forward.
    C = do_ref.shape[-1]
    d = C // num_heads
    nb = qkv_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1) < n
    # The normalized p = e/l is never materialized: row scalings fold into
    # the small (nb, d) operands instead of (nb, nb) passes —
    #   dv = p^T do           = e^T (do * linv)
    #   dp_s = scale * linv * (do @ v^T)  via  (do * linv * scale) @ v^T
    #   ds = scale * p * (dp - delta)     = e * (dp_s - linv * delta_s)
    # with delta_s = rowsum(e * dp_s) = scale * linv * delta.
    G = qkv_ref.shape[0]
    for g in range(G):
        for h in range(num_heads):
            q = jnp.where(row < n, qkv_ref[g, :, h * d:(h + 1) * d], 0)
            k = jnp.where(row < n, qkv_ref[g, :, C + h * d:C + (h + 1) * d], 0)
            v = jnp.where(row < n,
                          qkv_ref[g, :, 2 * C + h * d:2 * C + (h + 1) * d], 0)
            do = jnp.where(row < n, do_ref[g, :, h * d:(h + 1) * d],
                           0).astype(jnp.float32)
            s = jax.lax.dot_general(
                q.astype(jnp.float32) * scale, k.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = jnp.where(col_ok, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)                  # masked cols -> exact 0
            eb = e.astype(qkv_ref.dtype)
            linv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            dv = jax.lax.dot_general(eb, (do * linv).astype(qkv_ref.dtype),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp_s = jax.lax.dot_general(do * (linv * scale),
                                       v.astype(jnp.float32),
                                       (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            edp = e * dp_s
            delta_s = jnp.sum(edp, axis=-1, keepdims=True)
            ds = (edp - e * (linv * delta_s)).astype(qkv_ref.dtype)
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dt = dqkv_ref.dtype
            dqkv_ref[g, :, h * d:(h + 1) * d] = dq.astype(dt)
            dqkv_ref[g, :, C + h * d:C + (h + 1) * d] = dk.astype(dt)
            dqkv_ref[g, :, 2 * C + h * d:2 * C + (h + 1) * d] = dv.astype(dt)


def _samples_per_cell(B: int, nb: int, row_bytes: int, bwd: bool = False) -> int:
    """Samples per grid cell. Measured on v5e at ViT-S/b128: forward is best
    at G=1 (G=8 slows it ~40% — VMEM pressure eats the double buffering);
    backward is ~5% faster at G=2 (more independent chains hide the longer
    MXU/VPU dependency path; scripts/bench_mha_variants.py) — but only while
    the double-buffered operand blocks fit VMEM (at N=577 G=2 is a hard
    scoped-vmem OOM: 22.6M vs the 16M limit).

    At SMALL per-sample blocks (deit-tiny eval: C=192, 3 heads — each
    (sample, head) chain is a latency-bound 208x64 dot pair) the forward
    flips: G=2 measured 18% faster than G=1 at b256/C=192 (0.295 vs 0.359
    ms), G>=8 slower again; at ViT-S (C=384) G=2 is 15% SLOWER (0.358 vs
    0.311). The 1.5 MiB bound on the double-buffered pair separates the two
    regimes (tiny 1.28 MiB, S 2.56 MiB)."""
    per_sample = nb * row_bytes
    if bwd and B % 2 == 0:
        if 2 * per_sample * 2 <= 11 * 2 ** 20:  # 2 samples, double-buffered
            return 2
    if not bwd and B % 2 == 0 and 2 * per_sample * 2 <= (3 * 2 ** 20) // 2:
        return 2
    return 1


def _mha_fwd_call(qkv, num_heads, scale, interpret):
    B, N, C3 = qkv.shape
    C = C3 // 3
    nb = _round_block_n(N)
    G = _samples_per_cell(B, nb, (C3 + C) * qkv.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_mha_fwd_kernel, num_heads=num_heads, scale=scale,
                          n=N),
        grid=(B // G,),
        in_specs=[pl.BlockSpec((G, nb, C3), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((G, nb, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        interpret=interpret,
    )(qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_mha(qkv, num_heads: int, scale: float, interpret: bool = False):
    """softmax(Q K^T · scale) V over packed qkv.

    Args:
        qkv: (B, N, 3·C) — the qkv projection output, heads contiguous
            within each C-span (q = qkv[..., :C].reshape(B, N, H, d)).
    Returns:
        (B, N, C) attention output ready for the proj GEMM.
    """
    return _mha_fwd_call(qkv, num_heads, scale, interpret)


def _fused_mha_fwd(qkv, num_heads, scale, interpret):
    return _mha_fwd_call(qkv, num_heads, scale, interpret), qkv


def _fused_mha_bwd(num_heads, scale, interpret, qkv, do):
    B, N, C3 = qkv.shape
    C = C3 // 3
    nb = _round_block_n(N)
    G = _samples_per_cell(B, nb, (2 * C3 + C) * qkv.dtype.itemsize, bwd=True)
    dqkv = pl.pallas_call(
        functools.partial(_mha_bwd_kernel, num_heads=num_heads, scale=scale,
                          n=N),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, nb, C3), lambda b: (b, 0, 0)),
            pl.BlockSpec((G, nb, C), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, nb, C3), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C3), qkv.dtype),
        interpret=interpret,
    )(qkv, do)
    return (dqkv,)


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)


def _mha_fwd_proj_kernel(qkv_ref, wp_ref, bp_ref, y_ref, *, num_heads: int,
                         scale: float, n: int):
    """Forward MHA with the output projection folded in: y = (softmax(qk)v)
    @ Wp + bp, accumulated per head (y = sum_h o_h @ Wp[h*d:(h+1)*d]) so the
    (nb, C) attention output never leaves VMEM and the proj GEMM's HBM
    round-trip + the XLA<->pallas layout seam disappear (the seam cost a
    0.79 ms/fwd layout copy at deit-tiny b256 eval — scripts/profile_eval.py).
    Masking identical to ``_mha_fwd_kernel``."""
    C = y_ref.shape[-1]
    d = C // num_heads
    G, nb = qkv_ref.shape[0], qkv_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1) < n
    for g in range(G):
        acc = None
        for h in range(num_heads):
            q = qkv_ref[g, :, h * d:(h + 1) * d].astype(jnp.float32) * scale
            k = qkv_ref[g, :, C + h * d:C + (h + 1) * d]
            v = jnp.where(row < n,
                          qkv_ref[g, :, 2 * C + h * d:2 * C + (h + 1) * d], 0)
            s = jax.lax.dot_general(
                q, k.astype(jnp.float32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            s = jnp.where(col_ok, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            linv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(qkv_ref.dtype), v,
                        preferred_element_type=jnp.float32)
            ob = (o * linv).astype(qkv_ref.dtype)
            part = jnp.dot(ob, wp_ref[h * d:(h + 1) * d, :],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        y = acc + bp_ref[0].astype(jnp.float32)
        y_ref[g] = y.astype(y_ref.dtype)


def _mha_proj_fwd_call(qkv, wp, bp, num_heads, scale, interpret):
    B, N, C3 = qkv.shape
    C = C3 // 3
    nb = _round_block_n(N)
    G = _samples_per_cell(B, nb, (C3 + C) * qkv.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_mha_fwd_proj_kernel, num_heads=num_heads,
                          scale=scale, n=N),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, nb, C3), lambda b: (b, 0, 0)),
            pl.BlockSpec((C, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((G, nb, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        interpret=interpret,
    )(qkv, wp.astype(qkv.dtype), bp[None].astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_mha_proj(qkv, wp, bp, num_heads: int, scale: float,
                   interpret: bool = False):
    """softmax(QK^T · scale)V @ Wp + bp over packed qkv, one kernel.

    STATUS (r3): measured SLOWER than fused_mha + the XLA proj GEMM at
    deit-tiny b256 eval (attn kernel 3.18 -> 4.11 ms/fwd vs 0.44 saved) —
    the per-head (nb, d=64) @ (d, C) proj dots half-fill the MXU and
    serialize behind each softmax chain, where XLA runs one big (B*N, C) @
    (C, C) GEMM. NOT wired into the model (models/vit.py keeps the unfused
    proj); kept as a tested op for shapes where the proj GEMM is
    HBM-dominant. Under ``jax.grad`` the VJP recomputes through the unfused
    reference.
    """
    return _mha_proj_fwd_call(qkv, wp, bp, num_heads, scale, interpret)


def _mha_proj_ref(qkv, wp, bp, num_heads, scale):
    o = fused_mha_reference(qkv, num_heads, scale)
    return jnp.dot(o.astype(qkv.dtype), wp.astype(qkv.dtype),
                   preferred_element_type=jnp.float32).astype(qkv.dtype) + \
        bp.astype(qkv.dtype)


def _mha_proj_fwd(qkv, wp, bp, num_heads, scale, interpret):
    return _mha_proj_fwd_call(qkv, wp, bp, num_heads, scale, interpret), \
        (qkv, wp, bp)


def _mha_proj_bwd(num_heads, scale, interpret, res, dy):
    qkv, wp, bp = res
    _, vjp = jax.vjp(
        lambda a, b, c: _mha_proj_ref(a, b, c, num_heads, scale),
        qkv, wp, bp)
    return vjp(dy.astype(qkv.dtype))


fused_mha_proj.defvjp(_mha_proj_fwd, _mha_proj_bwd)


def fused_mha_reference(qkv, num_heads: int, scale: float):
    """Unfused oracle over packed qkv, for tests."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    d = C // num_heads
    q, k, v = [t.reshape(B, N, num_heads, d) for t in jnp.split(qkv, 3, -1)]
    return _xla_attention(q, k, v, scale).reshape(B, N, C)
