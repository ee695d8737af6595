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


# ---------------------------------------------------------------------------
# gather-in-kernel variant (r4): the dispatch gather rides the kernel DMA
# ---------------------------------------------------------------------------

def _layout_for(x, router_w, router_b, E, k, capacity=None):
    logits = jnp.dot(x.astype(jnp.float32), router_w) + router_b
    gate_w, eidx = moe_ops.naive_topk_gate(logits, k)
    gather_idx, pair_slot, e_of_tile, w_slot, keep = \
        moe_ops.aligned_expert_layout(eidx, E, gate_w=gate_w,
                                      weight_dtype=x.dtype, capacity=capacity)
    return gate_w, gather_idx, pair_slot, e_of_tile, w_slot, keep


@pytest.mark.parametrize("capacity", [None, 13, 300])
def test_gather_in_kernel_matches_materialized(capacity):
    # capacity=300: Cp = roundup(301, 256) = 512 -> 2 tiles/expert, so BOTH
    # variants auto-pair their backward onto LAYOUT_ROWS row tiles
    from slim_switch_moe_vit_tpu.ops.fused_ffn import (
        fused_expert_ffn, fused_expert_ffn_gather,
    )

    rs = np.random.RandomState(3)
    T, d, h, E, k = 160, 32, 64, 4, 2
    router_w, router_b, w1, b1, w2, b2 = _params(rs, E, d, h)
    x = jnp.asarray(rs.randn(T, d), jnp.float32)
    gate_w, gather_idx, pair_slot, e_of_tile, w_slot, keep = _layout_for(
        x, router_w, router_b, E, k, capacity=capacity)
    kp = None if capacity is None else keep

    def loss_ref(x, w1, b1, w2, b2):
        xs = moe_ops._dispatch_gather(x, gather_idx, pair_slot, kp)
        out = fused_expert_ffn(xs, w1, b1, w2, b2, e_of_tile)
        return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape))), out

    def loss_g(x, w1, b1, w2, b2):
        out = fused_expert_ffn_gather(x, gather_idx, pair_slot, kp,
                                      w1, b1, w2, b2, e_of_tile)
        return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape))), out

    (lr, yr), gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True)(x, w1, b1, w2, b2)
    (lg, yg), gg = jax.value_and_grad(loss_g, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True)(x, w1, b1, w2, b2)
    # fwd is the identical compute chain on identically-gathered rows; the
    # only difference in live slots is the DMA path, so exact equality —
    # except padding slots, which the gather variant leaves as stale buffer
    # contents (they are never read: combine weight 0). Compare live slots.
    live = np.zeros(yr.shape[0], bool)
    live[np.asarray(pair_slot).ravel()] = True
    if capacity is not None:
        live[-1] = False  # dropped pairs all point at the final padding slot
    np.testing.assert_array_equal(np.asarray(yg)[live], np.asarray(yr)[live])
    for a, b, name in zip(gg, gr, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4, err_msg=name)


def test_gather_in_kernel_env_knob_end_to_end(monkeypatch):
    rs = np.random.RandomState(4)
    T, d, h, E, k = 96, 32, 64, 4, 2
    router_w, router_b, w1, b1, w2, b2 = _params(rs, E, d, h)
    x = jnp.asarray(rs.randn(T, d), jnp.float32)

    def loss(x, w1):
        y, _ = moe_ops.moe_forward_fused(x, router_w, router_b,
                                         w1, b1, w2, b2, top_k=k)
        return jnp.sum(y * y)

    l_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(x, w1)
    monkeypatch.setenv("SSMV_GATHER_IN_KERNEL", "1")
    l_g, g_g = jax.value_and_grad(loss, argnums=(0, 1))(x, w1)
    np.testing.assert_allclose(float(l_g), float(l_ref), rtol=1e-6)
    for a, b in zip(g_g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4)


def test_paired_backward_auto_enables_and_matches(monkeypatch):
    """Capacity layouts whose expert regions pair up (even tile count) get
    the LAYOUT_ROWS backward automatically — grads must match the TILE_ROWS
    backward exactly (same math, bigger row blocks)."""
    from slim_switch_moe_vit_tpu.ops import fused_ffn
    from slim_switch_moe_vit_tpu.ops.fused_ffn import (
        TILE_ROWS, fused_expert_ffn,
    )

    rs = np.random.RandomState(5)
    T, d, h, E, k = 400, 32, 64, 2, 2
    router_w, router_b, w1, b1, w2, b2 = _params(rs, E, d, h)
    x = jnp.asarray(rs.randn(T, d), jnp.float32)
    capacity = 300  # Cp = roundup(301, 256) = 512 = 2 tiles/expert -> pairs
    logits = jnp.dot(x, router_w) + router_b
    gate_w, eidx = moe_ops.naive_topk_gate(logits, k)
    gather_idx, pair_slot, e_of_tile, w_slot, keep = \
        moe_ops.aligned_expert_layout(eidx, E, gate_w=gate_w,
                                      weight_dtype=x.dtype, capacity=capacity)
    assert gather_idx.shape[0] % fused_ffn.LAYOUT_ROWS == 0
    assert not isinstance(e_of_tile, jax.core.Tracer)
    xs = moe_ops._dispatch_gather(x, gather_idx, pair_slot, keep)

    seen_tiles = []
    real_bwd = fused_ffn._bwd

    def spy_bwd(dy, xs, w1, b1, w2, e_of_tile, dy_scale=None,
                tile=TILE_ROWS, defer_dw=False, force=None):
        seen_tiles.append(tile)
        return real_bwd(dy, xs, w1, b1, w2, e_of_tile, dy_scale=dy_scale,
                        tile=force or tile,
                        defer_dw=defer_dw and force is None)

    monkeypatch.setattr(fused_ffn, "_bwd", spy_bwd)

    def loss(xs, w1, b1, w2, b2):
        out = fused_expert_ffn(xs, w1, b1, w2, b2, e_of_tile)
        return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape)))

    g_paired = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(xs, w1, b1, w2, b2)
    assert seen_tiles == [fused_ffn.LAYOUT_ROWS]

    # baseline: same call, backward forced onto TILE_ROWS row blocks
    monkeypatch.setattr(
        fused_ffn, "_bwd",
        lambda *a, **kw: spy_bwd(*a, **{**kw, "force": TILE_ROWS}))
    g_base = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(xs, w1, b1, w2, b2)
    for a, b, name in zip(g_paired, g_base, ["dx", "dw1", "db1", "dw2",
                                             "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4, err_msg=name)


def test_permuted_kernel_matches_relayout():
    """fused_expert_ffn_permuted (VERDICT r4 #8): iterating interleaved rows
    expert-major via scalar-prefetch index maps must equal relayouting the
    rows expert-major and running the base kernel — outputs AND all grads,
    with the permuted output back in the caller's (source-major) order."""
    from slim_switch_moe_vit_tpu.ops.fused_ffn import (
        TILE_ROWS, fused_expert_ffn, fused_expert_ffn_permuted,
    )

    rs = np.random.RandomState(7)
    d, h, E = 32, 64, 3
    src, n_per = 4, 2  # 4 source blocks x 3 experts x 2 tiles each
    n_tiles = src * E * n_per
    Tp = n_tiles * TILE_ROWS
    _, _, w1, b1, w2, b2 = _params(rs, E, d, h)
    xs = jnp.asarray(rs.randn(Tp, d), jnp.float32)  # source-major rows

    # grid step (e, s, t) -> source-major tile s*E*n_per + e*n_per + t
    perm = np.arange(n_tiles, dtype=np.int32).reshape(
        src, E, n_per).transpose(1, 0, 2).reshape(-1)
    e_of_step = np.repeat(np.arange(E, dtype=np.int32), src * n_per)

    def loss_perm(xs, w1, b1, w2, b2):
        y = fused_expert_ffn_permuted(xs, w1, b1, w2, b2,
                                      jnp.asarray(e_of_step),
                                      jnp.asarray(perm))
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape))), y

    def loss_ref(xs, w1, b1, w2, b2):
        # relayout expert-major, run the base kernel, relayout back
        xr = xs.reshape(src, E, n_per * TILE_ROWS, d).transpose(1, 0, 2, 3)
        xr = xr.reshape(Tp, d)
        out = fused_expert_ffn(xr, w1, b1, w2, b2, jnp.asarray(e_of_step))
        out = out.reshape(E, src, n_per * TILE_ROWS, d).transpose(1, 0, 2, 3)
        y = out.reshape(Tp, d)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape))), y

    (lp, yp), gp = jax.value_and_grad(loss_perm, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True)(xs, w1, b1, w2, b2)
    (lr_, yr), gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 4),
                                       has_aux=True)(xs, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr), atol=2e-5)
    for a, b, name in zip(gp, gr, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4, err_msg=name)
