"""Expert-parallel capacity_fused: the fused Pallas FFN under shard_map
(ops/moe.py::moe_forward_fused_ep) on the 8-device virtual CPU mesh.

Pins (a) bit-level parity with single-device moe_forward_fused when one data
shard sees all tokens, (b) the documented per-data-shard capacity semantics
on a 2x4 mesh against an explicitly-built per-shard reference, (c) gradient
parity through the shard_map (psum transpose + local fused-FFN VJP), and
(d) the model-level route: MoEMlp picks the EP form whenever the ambient
mesh has a >1 expert axis.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slim_switch_moe_vit_tpu.models import create_model
from slim_switch_moe_vit_tpu.ops import moe as moe_ops
from slim_switch_moe_vit_tpu.parallel import (
    batch_sharding, make_mesh, shard_params,
)

E, D, H, K = 8, 16, 32, 2


def _mk_weights(seed=0):
    rs = np.random.RandomState(seed)
    return dict(
        router_w=jnp.asarray(rs.randn(D, E) * 0.5, jnp.float32),
        router_b=jnp.asarray(rs.randn(E) * 0.1, jnp.float32),
        w1=jnp.asarray(rs.randn(E, D, H) * 0.1, jnp.float32),
        b1=jnp.asarray(rs.randn(E, H) * 0.1, jnp.float32),
        w2=jnp.asarray(rs.randn(E, H, D) * 0.1, jnp.float32),
        b2=jnp.asarray(rs.randn(E, D) * 0.1, jnp.float32),
    )


def _tokens(T, seed=1):
    return jnp.asarray(np.random.RandomState(seed).randn(T, D), jnp.float32)


def test_ep_matches_single_device_one_data_shard():
    w = _mk_weights()
    x = _tokens(64)
    y_ref, aux_ref = moe_ops.moe_forward_fused(
        x, w["router_w"], w["router_b"], w["w1"], w["b1"], w["w2"], w["b2"],
        top_k=K, capacity_factor=0.75)

    mesh = make_mesh(n_data=1, n_expert=4)
    with jax.set_mesh(mesh):
        y, aux = jax.jit(lambda x, w: moe_ops.moe_forward_fused_ep(
            x, w["router_w"], w["router_b"], w["w1"], w["b1"], w["w2"],
            w["b2"], top_k=K, capacity_factor=0.75))(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(float(aux["drop_fraction"]),
                               float(aux_ref["drop_fraction"]), atol=1e-6)
    np.testing.assert_allclose(float(aux["balance_loss"]),
                               float(aux_ref["balance_loss"]), rtol=1e-5)


def test_ep_2x4_mesh_per_shard_capacity_semantics():
    """With 2 data shards the capacity ranking runs per shard (FastMoE's
    per-rank order): the reference is single-device capacity_fused applied to
    each half batch with the half-batch capacity."""
    w = _mk_weights(3)
    T = 128
    x = _tokens(T, seed=5)
    cap = moe_ops.compute_capacity(T // 2, E, K, 0.75)
    halves = []
    for h in range(2):
        xh = x[h * (T // 2):(h + 1) * (T // 2)]
        yh, auxh = moe_ops.moe_forward_fused(
            xh, w["router_w"], w["router_b"], w["w1"], w["b1"], w["w2"],
            w["b2"], top_k=K, capacity=cap)
        halves.append((yh, auxh))
    y_ref = jnp.concatenate([h[0] for h in halves])
    drop_ref = np.mean([float(h[1]["drop_fraction"]) for h in halves])

    mesh = make_mesh(n_data=2, n_expert=4)
    with jax.set_mesh(mesh):
        y, aux = jax.jit(lambda x, w: moe_ops.moe_forward_fused_ep(
            x, w["router_w"], w["router_b"], w["w1"], w["b1"], w["w2"],
            w["b2"], top_k=K, capacity_factor=0.75))(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(float(aux["drop_fraction"]), drop_ref,
                               atol=1e-6)
    # real pairs must have been dropped for this test to mean anything
    assert float(aux["drop_fraction"]) > 0.05


def test_ep_gradients_match_single_device():
    w = _mk_weights(7)
    x = _tokens(64, seed=9)

    def loss_single(w, x):
        y, _ = moe_ops.moe_forward_fused(
            x, w["router_w"], w["router_b"], w["w1"], w["b1"], w["w2"],
            w["b2"], top_k=K, capacity_factor=0.75)
        return jnp.sum(y * y)

    def loss_ep(w, x):
        y, _ = moe_ops.moe_forward_fused_ep(
            x, w["router_w"], w["router_b"], w["w1"], w["b1"], w["w2"],
            w["b2"], top_k=K, capacity_factor=0.75)
        return jnp.sum(y * y)

    g_ref = jax.grad(loss_single)(w, x)
    mesh = make_mesh(n_data=1, n_expert=4)
    with jax.set_mesh(mesh):
        g = jax.jit(jax.grad(loss_ep))(w, x)
    for k in g_ref:
        np.testing.assert_allclose(
            np.asarray(g[k]), np.asarray(g_ref[k]), atol=3e-4,
            err_msg=f"grad mismatch for {k}")


def test_model_routes_capacity_fused_to_ep_under_mesh():
    model = create_model("moe_tiny_patch16_224_expert8", num_classes=10,
                         img_size=32, dispatch_mode="capacity_fused",
                         capacity_factor=8.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x,
                           deterministic=True)
    ref = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))(
        variables, x)

    mesh = make_mesh(n_data=2, n_expert=4)
    with jax.set_mesh(mesh):
        sharded = shard_params(variables["params"], mesh)
        xs = jax.device_put(x, batch_sharding(mesh))
        out = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                               deterministic=True))(sharded, xs)
        # with capacity_factor 8.0 nothing drops, so the per-shard capacity
        # semantics cannot diverge from the single-device reference
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   atol=2e-5)

        # and the compiled HLO really communicates over the expert axis
        compiled = jax.jit(
            lambda p, x: model.apply({"params": p}, x, deterministic=True)
        ).lower(sharded, xs).compile()
        hlo = compiled.as_text()
        assert "all-reduce" in hlo or "reduce-scatter" in hlo, \
            "EP capacity_fused compiled without an expert-axis collective"
