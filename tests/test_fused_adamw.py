"""Fused AdamW+EMA kernel vs the optax reference chain: exact-math parity."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from slim_switch_moe_vit_tpu import optim


def _tree(rs):
    # mix of kernel-eligible (size % 1024 == 0) and fallback leaves,
    # including a gate param and a no-decay name
    return {
        "blocks_0": {
            "mlp": {"expert_fc1_kernel": jnp.asarray(
                rs.randn(4, 32, 32), jnp.float32)},        # 4096 -> kernel
            "moe_gate": {"kernel": jnp.asarray(
                rs.randn(16, 2), jnp.float32)},            # gate lr, fallback
            "attn": {"qkv": {
                "kernel": jnp.asarray(rs.randn(32, 96), jnp.float32),  # 3072
                "bias": jnp.asarray(rs.randn(96), jnp.float32)}},
        },
        "pos_embed": jnp.asarray(rs.randn(1, 5, 24), jnp.float32),  # no decay
    }


def test_fused_matches_optax_chain_with_ema():
    rs = np.random.RandomState(0)
    params = _tree(rs)
    opt_init, update = optim.make_optimizer(params, weight_decay=0.05)
    assert hasattr(update, "fused_apply")

    lr_b, lr_g = jnp.float32(1e-3), jnp.float32(5e-4)
    decay = 0.999

    # reference path (the optax chain the reference's AdamW parity is
    # validated against)
    p_ref = params
    s_ref = opt_init(params)
    ema_ref = jax.tree.map(jnp.copy, params)
    # fused path
    p_f = params
    s_f = opt_init(params)
    ema_f = jax.tree.map(jnp.copy, params)

    for step in range(4):
        g = jax.tree.map(
            lambda p: jnp.asarray(rs.randn(*p.shape), jnp.float32) * 0.1,
            params)
        upd, s_ref = update(g, s_ref, p_ref, lr_b, lr_g)
        p_ref = optax.apply_updates(p_ref, upd)
        ema_ref = jax.tree.map(
            lambda e, p: e * decay + p * (1 - decay), ema_ref, p_ref)

        p_f, s_f, ema_f = update.fused_apply(p_f, g, s_f, ema_f,
                                             lr_b, lr_g, decay)

    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-7)
    for a, b in zip(jax.tree.leaves(ema_ref), jax.tree.leaves(ema_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-7)
    assert int(s_f[0].count) == 4


def test_fused_no_ema_and_clip_fallback():
    rs = np.random.RandomState(1)
    params = _tree(rs)
    # clip_grad set -> no fused path attribute
    _, upd_clip = optim.make_optimizer(params, weight_decay=0.05,
                                       clip_grad=1.0)
    assert not hasattr(upd_clip, "fused_apply")

    opt_init, update = optim.make_optimizer(params, weight_decay=0.0)
    s = opt_init(params)
    g = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, params)
    p2, s2, ema2 = update.fused_apply(params, g, s, None,
                                      jnp.float32(1e-3), jnp.float32(1e-3),
                                      None)
    assert ema2 is None
    upd, s_ref = update(g, s, params, jnp.float32(1e-3), jnp.float32(1e-3))
    p_ref = optax.apply_updates(params, upd)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-7)
