"""Pallas flash-attention kernel for TPU.

The reference's attention is cuDNN/cuBLAS via torch (``models/
vision_transformer.py:260-280``: qkv GEMM, softmax(QK^T)V). Here the fused
inference path is a Pallas kernel: per (batch*head, q-block) grid cell, the
online-softmax loop over K/V blocks keeps scores in VMEM and never
materializes the (N, N) attention matrix in HBM.

Measured on the v5e (b32, H=6, d=64): correct to bf16 tolerance, but the XLA
attention is faster at ViT sequence lengths (0.94 vs 1.22 ms at N=197, 1.8 vs
2.9 ms at N=577) — d=64 pads to the 128-lane MXU width, wasting half the
array. Flash therefore stays opt-in (``use_flash``); its value here is the
O(N) memory footprint for long-sequence serving, not ViT throughput.

The kernel computes the forward pass; under ``jax.grad`` a custom VJP
recomputes with the plain XLA attention (correctness-first; a fused backward
kernel is future work — training defaults to the XLA path anyway).
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
