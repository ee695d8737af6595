"""Golden tests for the fused residual-add+LayerNorm kernels
(slim_switch_moe_vit_tpu/ops/fused_ln.py) against the unfused oracle, plus
model-level parity of the residual-deferred block chain."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slim_switch_moe_vit_tpu.ops import fused_ln as fl


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_add_ln_forward_matches_oracle(dtype):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(64, 192), dtype)
    r = jnp.asarray(rs.randn(64, 192), dtype)
    g = jnp.asarray(rs.randn(192) * 0.1 + 1.0, jnp.float32)
    b = jnp.asarray(rs.randn(192) * 0.1, jnp.float32)
    u, y = fl.fused_add_ln(x, r, g, b)
    u_ref, y_ref = fl.reference_add_ln(x, r, g, b)
    np.testing.assert_allclose(np.asarray(u, np.float32),
                               np.asarray(u_ref, np.float32), atol=1e-6)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32), atol=tol)


def test_fused_ln_no_residual_matches_oracle():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(40, 256), jnp.float32)
    g = jnp.asarray(rs.randn(256) * 0.1 + 1.0, jnp.float32)
    b = jnp.asarray(rs.randn(256) * 0.1, jnp.float32)
    y = fl.fused_ln(x, g, b)
    _, y_ref = fl.reference_add_ln(x, None, g, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_fused_add_ln_grads_match_oracle():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(32, 128), jnp.float32)
    r = jnp.asarray(rs.randn(32, 128), jnp.float32)
    g = jnp.asarray(rs.randn(128) * 0.1 + 1.0, jnp.float32)
    b = jnp.asarray(rs.randn(128) * 0.1, jnp.float32)
    # loss touches BOTH outputs so du_out and dy cotangents are exercised
    wu = jnp.asarray(rs.randn(32, 128), jnp.float32)
    wy = jnp.asarray(rs.randn(32, 128), jnp.float32)

    def loss_fused(x, r, g, b):
        u, y = fl.fused_add_ln(x, r, g, b)
        return jnp.sum(u * wu) + jnp.sum(y * wy)

    def loss_ref(x, r, g, b):
        u, y = fl.reference_add_ln(x, r, g, b)
        return jnp.sum(u * wu) + jnp.sum(y * wy)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, r, g, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, r, g, b)
    for a, e in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=2e-4)


def test_fused_ln_grads_match_oracle():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(24, 128), jnp.float32)
    g = jnp.asarray(rs.randn(128) * 0.1 + 1.0, jnp.float32)
    b = jnp.asarray(rs.randn(128) * 0.1, jnp.float32)
    wy = jnp.asarray(rs.randn(24, 128), jnp.float32)

    got = jax.grad(lambda x, g, b: jnp.sum(fl.fused_ln(x, g, b) * wy),
                   argnums=(0, 1, 2))(x, g, b)
    want = jax.grad(
        lambda x, g, b: jnp.sum(fl.reference_add_ln(x, None, g, b)[1] * wy),
        argnums=(0, 1, 2))(x, g, b)
    for a, e in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=2e-4)


def test_unsupported_rows_fall_back():
    # 5 rows: no valid tile -> LayerNorm module must take the XLA path
    import numpy as _np
    assert fl.supported(_np.zeros((5, 128))) is False
    assert fl.supported(_np.zeros((40, 192))) is True
    assert fl.supported(_np.zeros((2, 5, 128))) is True


def test_auto_policy_prefers_xla_at_unaligned_widths(monkeypatch):
    """'auto' uses the fused kernel only at 128-aligned channel widths (the
    r4-measured policy: at D=192 Mosaic pads lanes 192->256 and XLA LN is
    19% faster; D=384 keeps the fused win). Explicit impl='fused' still
    forces the kernel at any supported shape."""
    import numpy as _np

    from slim_switch_moe_vit_tpu.models.layers import LayerNorm

    assert fl.profitable(_np.zeros((40, 192))) is False   # deit-tiny width
    assert fl.profitable(_np.zeros((40, 384))) is True    # ViT-S width
    assert fl.profitable(_np.zeros((2, 8, 768))) is True  # ViT-B width

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    x192, x384 = _np.zeros((40, 192)), _np.zeros((40, 384))
    assert LayerNorm(impl="auto")._fused_ok(x192) is False
    assert LayerNorm(impl="auto")._fused_ok(x384) is True
    assert LayerNorm(impl="fused")._fused_ok(x192) is True
    assert LayerNorm(impl="xla")._fused_ok(x384) is False
    # non-TPU backend: auto never picks the fused kernel
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert LayerNorm(impl="auto")._fused_ok(x384) is False


def test_vit_deferred_chain_matches_plain_blocks():
    """ViT forward + grads with ln_impl='fused' (interpret kernels) must equal
    the plain per-block path (ln_impl='xla')."""
    from slim_switch_moe_vit_tpu.models.vit import VisionTransformer

    kw = dict(img_size=32, patch_size=16, num_classes=7, embed_dim=128,
              depth=2, num_heads=4, attn_impl="xla")
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(8, 32, 32, 3), jnp.float32)

    m_x = VisionTransformer(ln_impl="xla", **kw)
    m_f = VisionTransformer(ln_impl="fused", **kw)
    variables = m_x.init({"params": jax.random.PRNGKey(0)}, x,
                         deterministic=True)

    out_x = m_x.apply(variables, x, deterministic=True)
    out_f = m_f.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=1e-4)

    def loss(m):
        def f(params):
            out = m.apply({"params": params}, x, deterministic=True)
            return jnp.sum(out ** 2)
        return f

    g_x = jax.grad(loss(m_x))(variables["params"])
    g_f = jax.grad(loss(m_f))(variables["params"])
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_f)}
    for k, v in flat_x:
        np.testing.assert_allclose(
            np.asarray(flat_f[jax.tree_util.keystr(k)]), np.asarray(v),
            atol=5e-3, err_msg=jax.tree_util.keystr(k))


def test_fused_sum_ln_matches_oracle_with_grads():
    rs = np.random.RandomState(5)
    a = jnp.asarray(rs.randn(4, 24, 128), jnp.float32)
    b = jnp.asarray(rs.randn(4, 24, 128), jnp.float32)
    g = jnp.asarray(rs.randn(128) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rs.randn(128) * 0.1, jnp.float32)
    wy = jnp.asarray(rs.randn(4, 24, 128), jnp.float32)

    y = fl.fused_sum_ln(a, b, g, be)
    _, y_ref = fl.reference_add_ln(a, b, g, be)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)

    got = jax.grad(lambda *args: jnp.sum(fl.fused_sum_ln(*args) * wy),
                   argnums=(0, 1, 2, 3))(a, b, g, be)
    want = jax.grad(
        lambda *args: jnp.sum(fl.reference_add_ln(*args)[1] * wy),
        argnums=(0, 1, 2, 3))(a, b, g, be)
    for x, e in zip(got, want):
        np.testing.assert_allclose(np.asarray(x), np.asarray(e), atol=2e-4)


def test_resmoe_deferred_chain_matches_plain():
    """ResMoE model with fused (interpret) norms == plain XLA path, fwd+grad."""
    from slim_switch_moe_vit_tpu import create_model

    rs = np.random.RandomState(6)
    x = jnp.asarray(rs.randn(4, 32, 32, 3), jnp.float32)
    kw = dict(num_classes=5, img_size=32, attn_impl="xla",
              dispatch_mode="ragged")
    m_x = create_model("resmoe_tiny_patch16_224_expert8", ln_impl="xla", **kw)
    m_f = create_model("resmoe_tiny_patch16_224_expert8", ln_impl="fused", **kw)
    variables = m_x.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, x,
                         deterministic=True)

    out_x = m_x.apply(variables, x, deterministic=True)
    out_f = m_f.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=2e-4)

    def loss(m):
        def f(params):
            out, _ = m.apply(
                {"params": params, "gates": variables["gates"]}, x,
                deterministic=True, mutable=["moe_metrics"])
            return jnp.sum(out ** 2)
        return f

    g_x = jax.grad(loss(m_x))(variables["params"])
    g_f = jax.grad(loss(m_f))(variables["params"])
    for (k, vx), vf in zip(
            jax.tree_util.tree_leaves_with_path(g_x),
            jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vx),
                                   atol=5e-3,
                                   err_msg=jax.tree_util.keystr(k))
