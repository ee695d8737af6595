"""Polynomial GELU approximations used by the bf16 fused-FFN kernels.

bf16 activations round at ~0.4% relative, so the kernels swap the exact
erf chain (exp + reciprocal, ~7 ms/step at ViT-S/b128) for odd polynomials
whose error sits an order below bf16 rounding. f32 models keep exact erf.
"""
import jax
import jax.numpy as jnp
import numpy as np

from slim_switch_moe_vit_tpu.ops.fused_ffn import (
    _dgelu, _dgelu_poly, _gelu, _gelu_fns, _gelu_poly,
)


def test_gelu_poly_close_to_exact():
    h = jnp.asarray(np.linspace(-12.0, 12.0, 20001), jnp.float32)
    want = jax.nn.gelu(h, approximate=False)
    got = _gelu_poly(h)
    assert float(jnp.max(jnp.abs(got - want))) < 2e-3
    # and the exact path really is exact
    assert float(jnp.max(jnp.abs(_gelu(h) - want))) < 1e-5


def test_dgelu_poly_close_to_exact_derivative():
    h = jnp.asarray(np.linspace(-12.0, 12.0, 20001), jnp.float32)
    want = jax.vmap(jax.grad(lambda v: jax.nn.gelu(v, approximate=False)))(h)
    got = _dgelu_poly(h)
    assert float(jnp.max(jnp.abs(got - want))) < 4e-3
    assert float(jnp.max(jnp.abs(_dgelu(h) - want))) < 1e-5


def test_gelu_fns_dispatch():
    assert _gelu_fns(jnp.bfloat16) == (_gelu_poly, _dgelu_poly)
    assert _gelu_fns(jnp.float32) == (_gelu, _dgelu)


def test_fused_bf16_matches_ragged_bf16():
    """End-to-end: the bf16 fused path (poly gelu) stays within bf16
    tolerance of the bf16 ragged path (exact gelu)."""
    from slim_switch_moe_vit_tpu.ops import moe as moe_ops

    rs = np.random.RandomState(3)
    T, d, h, E, k = 128, 32, 64, 4, 2
    mk = lambda *s: jnp.asarray(rs.randn(*s) * 0.1, jnp.bfloat16)
    router_w, router_b = mk(d, E), jnp.zeros((E,), jnp.float32)
    w1, b1 = mk(E, d, h), jnp.zeros((E, h), jnp.float32)
    w2, b2 = mk(E, h, d), jnp.zeros((E, d), jnp.float32)
    x = mk(T, d)
    yf, _ = moe_ops.moe_forward_fused(x, router_w, router_b, w1, b1, w2, b2,
                                      top_k=k)
    yr, _ = moe_ops.moe_forward_ragged(x, router_w, router_b, w1, b1, w2, b2,
                                       top_k=k)
    np.testing.assert_allclose(np.asarray(yf, np.float32),
                               np.asarray(yr, np.float32),
                               atol=2e-2, rtol=2e-2)
