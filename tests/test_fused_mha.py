"""Fused packed-qkv MHA kernel vs the unfused XLA oracle.

The kernel (ops/attention.py::fused_mha) replaces the reference's
torch/cuDNN attention path (/root/reference/models/vision_transformer.py:260-280)
on the training hot path. These tests run it in interpret mode on CPU and
check forward values and gradients against the einsum oracle, including the
non-128-aligned N=197 ViT shape whose block overhang exercises the in-kernel
row/column masking.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slim_switch_moe_vit_tpu.ops.attention import fused_mha, fused_mha_reference


@pytest.mark.parametrize("N", [197, 128, 64])
def test_fused_mha_matches_oracle_fwd(N):
    B, H, d = 3, 6, 64
    C = H * d
    qkv = jnp.asarray(np.random.RandomState(0).randn(B, N, 3 * C), jnp.float32)
    got = fused_mha(qkv, H, d ** -0.5, True)
    want = fused_mha_reference(qkv, H, d ** -0.5)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_mha_grad_matches_oracle():
    B, N, H, d = 2, 197, 3, 32
    C = H * d
    rng = np.random.RandomState(1)
    qkv = jnp.asarray(rng.randn(B, N, 3 * C), jnp.float32)
    w = jnp.asarray(rng.randn(C), jnp.float32)

    def loss_fused(qkv):
        return jnp.sum(fused_mha(qkv, H, d ** -0.5, True) * w)

    def loss_ref(qkv):
        return jnp.sum(fused_mha_reference(qkv, H, d ** -0.5) * w)

    lf, gf = jax.value_and_grad(loss_fused)(qkv)
    lr, gr = jax.value_and_grad(loss_ref)(qkv)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("N", [197, 64])
def test_fused_mha_proj_matches_unfused(N):
    """Proj-folded inference kernel == fused_mha followed by the proj GEMM."""
    from slim_switch_moe_vit_tpu.ops.attention import fused_mha_proj

    B, H, d = 4, 3, 64
    C = H * d
    rng = np.random.RandomState(3)
    qkv = jnp.asarray(rng.randn(B, N, 3 * C), jnp.float32)
    wp = jnp.asarray(rng.randn(C, C) * 0.05, jnp.float32)
    bp = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    got = fused_mha_proj(qkv, wp, bp, H, d ** -0.5, True)
    want = jnp.dot(fused_mha_reference(qkv, H, d ** -0.5), wp) + bp
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_fused_mha_proj_grads_match_reference():
    """The VJP (reference recompute) provides correct dqkv/dwp/dbp."""
    from slim_switch_moe_vit_tpu.ops.attention import fused_mha_proj

    B, N, H, d = 2, 64, 3, 32
    C = H * d
    rng = np.random.RandomState(4)
    qkv = jnp.asarray(rng.randn(B, N, 3 * C), jnp.float32)
    wp = jnp.asarray(rng.randn(C, C) * 0.05, jnp.float32)
    bp = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)

    def loss_fused(qkv, wp, bp):
        return jnp.sum(fused_mha_proj(qkv, wp, bp, H, d ** -0.5, True) ** 2)

    def loss_ref(qkv, wp, bp):
        y = jnp.dot(fused_mha_reference(qkv, H, d ** -0.5), wp) + bp
        return jnp.sum(y ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(qkv, wp, bp)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, wp, bp)
    for a, b, nm in zip(gf, gr, ("dqkv", "dwp", "dbp")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-3, err_msg=nm)


def test_attention_module_fused_equals_xla():
    """The Attention module produces identical results on both impls."""
    from slim_switch_moe_vit_tpu.models.vit import Attention

    B, N, C, H = 2, 197, 192, 3
    x = jnp.asarray(np.random.RandomState(2).randn(B, N, C), jnp.float32)
    m_xla = Attention(num_heads=H, attn_impl="xla")
    m_fused = Attention(num_heads=H, attn_impl="fused")
    params = m_xla.init(jax.random.PRNGKey(0), x, deterministic=True)
    y_xla = m_xla.apply(params, x, deterministic=True)
    y_fused = m_fused.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_xla),
                               rtol=2e-4, atol=2e-4)


def test_bwd_samples_per_cell_respects_vmem():
    """G=2 backward blocks must not exceed scoped VMEM: at N=577 (384px
    finetune) G=2 was a hard compile OOM (22.6M vs 16M)."""
    from slim_switch_moe_vit_tpu.ops.attention import _samples_per_cell

    C = 384
    row_bytes = (2 * 3 * C + C) * 2
    assert _samples_per_cell(128, 208, row_bytes, bwd=True) == 2
    assert _samples_per_cell(64, 592, row_bytes, bwd=True) == 1
    assert _samples_per_cell(128, 208, row_bytes, bwd=False) == 1
