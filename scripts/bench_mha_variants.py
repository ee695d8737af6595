"""Micro-bench MHA kernel variants at the flagship shape (B=128, N=197, H=6,
d=64, bf16) to find the next win. Run on the real chip.

Variants:
  base      — current fused_mha (per-sample cell, head loop)
  g2        — 2 samples per grid cell
  bf16bwd   — backward elementwise chain on bf16 score tiles
  headmajor — qkv packed head-major ([q_h|k_h|v_h] per head contiguous),
              grid (B, H/hpc): each cell handles hpc heads via one
              contiguous 192*hpc-column slice
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
from slim_switch_moe_vit_tpu.ops.attention import (  # noqa: E402
    fused_mha, fused_mha_reference, _round_block_n)

B, N, H, d = 128, 197, 6, 64
C = H * d
K = 100


def timed(name, fn, *args):
    @jax.jit
    def run(a0, rest):
        def body(c, _):
            out = fn(c, *rest)
            return c + out.ravel()[0] * jnp.asarray(1e-12, c.dtype), out.ravel()[0]
        c, outs = jax.lax.scan(body, a0, None, length=K)
        return outs[-1]

    _ = float(run(args[0], args[1:]))
    t0 = time.perf_counter()
    _ = float(run(args[0], args[1:]))
    dt = (time.perf_counter() - t0) / K * 1000
    print(f"{name:30s} {dt:8.3f} ms", flush=True)
    return dt


# --------------------------------------------------------------------------
# variant: G samples per cell (reuse production kernels, different grid)
# --------------------------------------------------------------------------
from slim_switch_moe_vit_tpu.ops.attention import (  # noqa: E402
    _mha_fwd_kernel, _mha_bwd_kernel)


def mha_fwd_g(qkv, G):
    Bs, Nn, C3 = qkv.shape
    Cc = C3 // 3
    nb = _round_block_n(Nn)
    return pl.pallas_call(
        functools.partial(_mha_fwd_kernel, num_heads=H, scale=d ** -0.5, n=Nn),
        grid=(Bs // G,),
        in_specs=[pl.BlockSpec((G, nb, C3), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((G, nb, Cc), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bs, Nn, Cc), qkv.dtype),
    )(qkv)


def mha_bwd_g(qkv, do, G):
    Bs, Nn, C3 = qkv.shape
    Cc = C3 // 3
    nb = _round_block_n(Nn)
    return pl.pallas_call(
        functools.partial(_mha_bwd_kernel, num_heads=H, scale=d ** -0.5, n=Nn),
        grid=(Bs // G,),
        in_specs=[
            pl.BlockSpec((G, nb, C3), lambda b: (b, 0, 0)),
            pl.BlockSpec((G, nb, Cc), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, nb, C3), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bs, Nn, C3), qkv.dtype),
    )(qkv, do)


# --------------------------------------------------------------------------
# variant: bf16 backward elementwise chain
# --------------------------------------------------------------------------
def _bwd_kernel_bf16(qkv_ref, do_ref, dqkv_ref, *, num_heads, scale, n):
    Cc = do_ref.shape[-1]
    dd = Cc // num_heads
    nb = qkv_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1) < n
    for g in range(qkv_ref.shape[0]):
        for h in range(num_heads):
            q = jnp.where(row < n, qkv_ref[g, :, h * dd:(h + 1) * dd], 0)
            k = jnp.where(row < n, qkv_ref[g, :, Cc + h * dd:Cc + (h + 1) * dd], 0)
            v = jnp.where(row < n,
                          qkv_ref[g, :, 2 * Cc + h * dd:2 * Cc + (h + 1) * dd], 0)
            do = jnp.where(row < n, do_ref[g, :, h * dd:(h + 1) * dd],
                           0).astype(jnp.float32)
            s = jax.lax.dot_general(
                q.astype(jnp.float32) * scale, k.astype(jnp.float32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            s = jnp.where(col_ok, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            eb = e.astype(jnp.bfloat16)            # one f32->bf16 pass
            linv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            dv = jax.lax.dot_general(eb, (do * linv).astype(qkv_ref.dtype),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp_s = jax.lax.dot_general(do * (linv * scale),
                                       v.astype(jnp.float32),
                                       (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            # bf16 elementwise chain (the cast of dp_s is one pass; edp,
            # rowsum, ds then run on half-width data)
            dpb = dp_s.astype(jnp.bfloat16)
            edp = eb * dpb
            delta_s = jnp.sum(edp.astype(jnp.float32), axis=-1, keepdims=True)
            ds = edp - eb * (linv * delta_s).astype(jnp.bfloat16)
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dt = dqkv_ref.dtype
            dqkv_ref[g, :, h * dd:(h + 1) * dd] = dq.astype(dt)
            dqkv_ref[g, :, Cc + h * dd:Cc + (h + 1) * dd] = dk.astype(dt)
            dqkv_ref[g, :, 2 * Cc + h * dd:2 * Cc + (h + 1) * dd] = dv.astype(dt)


def mha_bwd_bf16(qkv, do):
    Bs, Nn, C3 = qkv.shape
    Cc = C3 // 3
    nb = _round_block_n(Nn)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_bf16, num_heads=H, scale=d ** -0.5, n=Nn),
        grid=(Bs,),
        in_specs=[
            pl.BlockSpec((1, nb, C3), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nb, Cc), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nb, C3), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bs, Nn, C3), qkv.dtype),
    )(qkv, do)


# --------------------------------------------------------------------------
# variant: head-major layout, hpc heads per cell
# --------------------------------------------------------------------------
def _hm_fwd_kernel(qkv_ref, o_ref, *, hpc, dd, scale, n):
    nb = qkv_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1) < n
    for h in range(hpc):
        base = h * 3 * dd
        q = qkv_ref[0, :, base:base + dd].astype(jnp.float32) * scale
        k = qkv_ref[0, :, base + dd:base + 2 * dd]
        v = jnp.where(row < n, qkv_ref[0, :, base + 2 * dd:base + 3 * dd], 0)
        s = jax.lax.dot_general(q, k.astype(jnp.float32),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(col_ok, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        linv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(qkv_ref.dtype), v,
                    preferred_element_type=jnp.float32)
        o_ref[0, :, h * dd:(h + 1) * dd] = (o * linv).astype(o_ref.dtype)


def mha_fwd_headmajor(qkv_hm, hpc):
    """qkv_hm: (B, N, H*3*d) head-major. Output (B, N, C) head-major o."""
    Bs, Nn, _ = qkv_hm.shape
    nb = _round_block_n(Nn)
    span = hpc * 3 * d
    return pl.pallas_call(
        functools.partial(_hm_fwd_kernel, hpc=hpc, dd=d, scale=d ** -0.5, n=Nn),
        grid=(Bs, H // hpc),
        in_specs=[pl.BlockSpec((1, nb, span), lambda b, hh: (b, 0, hh))],
        out_specs=pl.BlockSpec((1, nb, hpc * d), lambda b, hh: (b, 0, hh)),
        out_shape=jax.ShapeDtypeStruct((Bs, Nn, C), qkv_hm.dtype),
    )(qkv_hm)


def main():
    rs = np.random.RandomState(0)
    qkv = jnp.asarray(rs.randn(B, N, 3 * C) * 0.05, jnp.bfloat16)
    do = jnp.asarray(rs.randn(B, N, C) * 0.05, jnp.bfloat16)
    scale = d ** -0.5

    # head-major repack of the same tensor for parity check
    perm = np.arange(3 * C).reshape(3, H, d).transpose(1, 0, 2).reshape(-1)
    qkv_hm = qkv[:, :, perm]

    ref = fused_mha_reference(qkv, H, scale)
    base = fused_mha(qkv, H, scale)
    print("base fwd max err:", float(jnp.max(jnp.abs(base.astype(jnp.float32)
                                                     - ref.astype(jnp.float32)))))
    hm = mha_fwd_headmajor(qkv_hm, 2)
    print("hm   fwd max err:", float(jnp.max(jnp.abs(hm.astype(jnp.float32)
                                                     - ref.astype(jnp.float32)))))
    bb = mha_bwd_bf16(qkv, do)
    _, vjp = jax.vjp(lambda q: fused_mha_reference(q, H, scale), qkv)
    dref = vjp(do)[0]
    print("bf16 bwd max err:", float(jnp.max(jnp.abs(bb.astype(jnp.float32)
                                                     - dref.astype(jnp.float32)))))

    timed("fwd base", lambda q: fused_mha(q, H, scale), qkv)
    # lane rule: block span must be 128-divisible -> hpc=2 (384 cols) only
    timed("fwd headmajor hpc=2", lambda q: mha_fwd_headmajor(q, 2), qkv_hm)

    from slim_switch_moe_vit_tpu.ops.attention import _fused_mha_bwd
    timed("bwd base", lambda q: _fused_mha_bwd(H, scale, False, q, do)[0], qkv)
    timed("bwd g2", lambda q: mha_bwd_g(q, do, 2), qkv)
    timed("bwd bf16chain", lambda q: mha_bwd_bf16(q, do), qkv)


if __name__ == "__main__":
    main()
