"""Fused Pallas expert-FFN: values + grads vs the dense dropless oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slim_switch_moe_vit_tpu.ops import moe as moe_ops


def _params(rs, E, d, h):
    return (
        jnp.asarray(rs.randn(d, E) * 0.1, jnp.float32),    # router_w
        jnp.asarray(rs.randn(E) * 0.01, jnp.float32),      # router_b
        jnp.asarray(rs.randn(E, d, h) * 0.05, jnp.float32),
        jnp.asarray(rs.randn(E, h) * 0.01, jnp.float32),
        jnp.asarray(rs.randn(E, h, d) * 0.05, jnp.float32),
        jnp.asarray(rs.randn(E, d) * 0.01, jnp.float32),
    )


def test_aligned_layout_roundtrip():
    rs = np.random.RandomState(0)
    T, k, E = 37, 2, 4
    eidx = jnp.asarray(rs.randint(0, E, (T, k)), jnp.int32)
    from slim_switch_moe_vit_tpu.ops.fused_ffn import TILE_ROWS

    gate = jnp.asarray(rs.rand(T, k), jnp.float32)
    gather_idx, pair_slot, e_of_tile, w_slot, _ = moe_ops.aligned_expert_layout(
        eidx, E, gate_w=gate)
    gi, ps, et, ws = map(np.asarray, (gather_idx, pair_slot, e_of_tile,
                                      np.asarray(w_slot, np.float32)))
    gate_np = np.asarray(gate)
    # each pair's slot holds its own token and bf16 gate weight, in a tile
    # owned by its expert
    for t in range(T):
        for kk in range(k):
            s = ps[t, kk]
            assert gi[s] == t
            np.testing.assert_allclose(ws[s], gate_np[t, kk], rtol=8e-3)
            assert et[s // TILE_ROWS] == eidx[t, kk]
    # slots are unique; every padding slot carries zero combine weight
    assert len(set(ps.ravel().tolist())) == T * k
    pad = np.ones(ws.shape, bool)
    pad[ps.ravel()] = False
    assert (ws[pad] == 0).all()


def test_fused_matches_dense_oracle_fwd_and_grad():
    rs = np.random.RandomState(1)
    T, d, h, E, k = 96, 32, 64, 4, 2
    router_w, router_b, w1, b1, w2, b2 = _params(rs, E, d, h)
    x = jnp.asarray(rs.randn(T, d), jnp.float32)

    def fused_loss(x, w1, b1, w2, b2):
        y, _ = moe_ops.moe_forward_fused(x, router_w, router_b,
                                         w1, b1, w2, b2, top_k=k)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape))), y

    def dense_loss(x, w1, b1, w2, b2):
        y = moe_ops.moe_dense(x, router_w, router_b, w1, b1, w2, b2, top_k=k)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape))), y

    (lf, yf), gf = jax.value_and_grad(fused_loss, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True)(x, w1, b1, w2, b2)
    (ld, yd), gd = jax.value_and_grad(dense_loss, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True)(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yd),
                               atol=2e-5, rtol=1e-5)
    for a, b, name in zip(gf, gd, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4, err_msg=name)


def test_fused_matches_ragged():
    rs = np.random.RandomState(2)
    T, d, h, E, k = 200, 24, 48, 8, 2
    router_w, router_b, w1, b1, w2, b2 = _params(rs, E, d, h)
    x = jnp.asarray(rs.randn(T, d), jnp.float32)
    yf, auxf = moe_ops.moe_forward_fused(x, router_w, router_b,
                                         w1, b1, w2, b2, top_k=k)
    yr, auxr = moe_ops.moe_forward_ragged(x, router_w, router_b,
                                          w1, b1, w2, b2, top_k=k)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(float(auxf["balance_loss"]),
                               float(auxr["balance_loss"]), rtol=1e-6)


def test_moe_mlp_fused_mode_in_model():
    from slim_switch_moe_vit_tpu.models import create_model

    model = create_model("moe_tiny_patch16_224_expert8", num_classes=10,
                         img_size=32, dispatch_mode="fused")
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x,
                           deterministic=True)
    ref_model = create_model("moe_tiny_patch16_224_expert8", num_classes=10,
                             img_size=32, dispatch_mode="ragged")
    out = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))(
        variables, x)
    ref = jax.jit(lambda v, x: ref_model.apply(v, x, deterministic=True))(
        variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
