"""Flash-attention kernel vs unfused oracle (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slim_switch_moe_vit_tpu.ops.attention import (
    _flash_forward, flash_attention_reference,
)


@pytest.mark.parametrize("N", [197, 128, 300])
@pytest.mark.parametrize("d", [64, 128])
def test_flash_matches_oracle(N, d):
    B, H = 2, 3
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, N, H, d), jnp.float32)
    k = jax.random.normal(ks[1], (B, N, H, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, N, H, d), jnp.float32)
    scale = d ** -0.5
    got = _flash_forward(q, k, v, scale, interpret=True)
    want = flash_attention_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_custom_vjp_grads():
    from slim_switch_moe_vit_tpu.ops import attention as A

    # monkeypatch the fwd to interpret mode so the test runs on CPU
    B, N, H, d = 1, 64, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, N, H, d))
    k = jax.random.normal(ks[1], (B, N, H, d))
    v = jax.random.normal(ks[2], (B, N, H, d))
    scale = d ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(A._flash_forward(q, k, v, scale, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(A.flash_attention_reference(q, k, v, scale) ** 2)

    # the custom-vjp backward differentiates the oracle; compare oracle grads
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    out_f = A._flash_forward(q, k, v, scale, interpret=True)
    out_r = A.flash_attention_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=2e-5)
    assert all(float(jnp.abs(g).sum()) > 0 for g in g_ref)
