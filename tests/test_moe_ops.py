"""Golden-value tests for the MoE dispatch path vs the exact dense oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slim_switch_moe_vit_tpu.ops import moe as moe_ops


def _params(key, d=16, h=32, E=4):
    ks = jax.random.split(key, 7)
    return dict(
        router_w=jax.random.normal(ks[0], (d, E)) * 0.2,
        router_b=jnp.zeros((E,)),
        w1=jax.random.normal(ks[1], (E, d, h)) * 0.2,
        b1=jax.random.normal(ks[2], (E, h)) * 0.1,
        w2=jax.random.normal(ks[3], (E, h, d)) * 0.2,
        b2=jax.random.normal(ks[4], (E, d)) * 0.1,
    )


def test_gate_topk_softmax_after_selection():
    logits = jnp.array([[1.0, 3.0, 2.0, -1.0]])
    w, idx = moe_ops.naive_topk_gate(logits, 2)
    assert idx.tolist() == [[1, 2]]
    expect = jax.nn.softmax(jnp.array([3.0, 2.0]))
    np.testing.assert_allclose(w[0], expect, rtol=1e-6)


def test_dispatch_positions_and_capacity():
    idx = jnp.array([[0], [0], [1], [0]], dtype=jnp.int32)  # 3 tokens want e0
    dest, keep = moe_ops.make_dispatch(idx, num_experts=2, capacity=2)
    # first two expert-0 tokens land in slots 0,1; third is dropped
    assert dest[0, 0] == 0 and dest[1, 0] == 1
    assert not keep[3, 0]
    assert keep[0, 0] and keep[1, 0] and keep[2, 0]
    assert dest[2, 0] == 2 * 1 + 0  # expert1 slot0 (flat = e*C + pos)


def test_dispatch_combine_roundtrip():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 4))
    idx = jnp.array([[i % 2] for i in range(8)], dtype=jnp.int32)
    dest, keep = moe_ops.make_dispatch(idx, num_experts=2, capacity=8)
    buf = moe_ops.dispatch_tokens(x, dest, 2, 8)
    # identity experts: combine with weight 1 must return x
    y = moe_ops.combine_tokens(buf, dest, keep, jnp.ones((8, 1)))
    np.testing.assert_allclose(y, x, rtol=1e-6)


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_forward_matches_dense_when_no_drop(top_k):
    key = jax.random.PRNGKey(1)
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(2), (32, 16))
    # capacity = T guarantees nothing drops -> must equal dropless dense oracle
    y, aux = moe_ops.moe_forward(
        x, p["router_w"], p["router_b"], p["w1"], p["b1"], p["w2"], p["b2"],
        top_k=top_k, capacity=32,
    )
    y_ref = moe_ops.moe_dense(
        x, p["router_w"], p["router_b"], p["w1"], p["b1"], p["w2"], p["b2"],
        top_k=top_k,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)
    assert float(aux["drop_fraction"]) == 0.0


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_ragged_matches_dense(top_k):
    key = jax.random.PRNGKey(7)
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(8), (32, 16))
    y, aux = moe_ops.moe_forward_ragged(
        x, p["router_w"], p["router_b"], p["w1"], p["b1"], p["w2"], p["b2"],
        top_k=top_k,
    )
    y_ref = moe_ops.moe_dense(
        x, p["router_w"], p["router_b"], p["w1"], p["b1"], p["w2"], p["b2"],
        top_k=top_k,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)
    assert float(aux["drop_fraction"]) == 0.0  # dropless by construction


def test_moe_ragged_grads_flow():
    p = _params(jax.random.PRNGKey(9))
    x = jax.random.normal(jax.random.PRNGKey(10), (16, 16))

    def loss(params):
        y, _ = moe_ops.moe_forward_ragged(
            x, params["router_w"], params["router_b"],
            params["w1"], params["b1"], params["w2"], params["b2"], top_k=2)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(p)
    for name in ["router_w", "w1", "w2", "b1", "b2"]:
        assert float(jnp.abs(g[name]).sum()) > 0, name


def test_moe_forward_grads_flow():
    p = _params(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 16))

    def loss(params):
        y, _ = moe_ops.moe_forward(
            x, params["router_w"], params["router_b"],
            params["w1"], params["b1"], params["w2"], params["b2"],
            top_k=2, capacity=16,
        )
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(p)
    for name in ["router_w", "w1", "w2", "b1", "b2"]:
        assert float(jnp.abs(g[name]).sum()) > 0, name


def test_capacity_drop_reported():
    p = _params(jax.random.PRNGKey(5), E=2)
    x = jax.random.normal(jax.random.PRNGKey(6), (64, 16))
    _, aux = moe_ops.moe_forward(
        x, p["router_w"], p["router_b"], p["w1"], p["b1"], p["w2"], p["b2"],
        top_k=2, capacity=8,  # 128 assignments into 16 slots -> drops
    )
    assert float(aux["drop_fraction"]) > 0.5


def test_load_balance_loss_uniform_is_one():
    # perfectly uniform routing -> loss == 1.0 (E * sum_e (1/E)*(1/E) * E)
    T, E = 64, 4
    logits = jnp.zeros((T, E))
    idx = jnp.stack([jnp.arange(T) % E, (jnp.arange(T) + 1) % E], axis=1)
    loss = moe_ops.load_balance_loss(logits, idx.astype(jnp.int32), E)
    np.testing.assert_allclose(float(loss), 1.0, rtol=1e-5)


def test_expert_choice_basic_properties():
    key = jax.random.PRNGKey(11)
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(12), (32, 16))
    y, aux = moe_ops.moe_forward_expert_choice(
        x, p["router_w"], p["router_b"], p["w1"], p["b1"], p["w2"], p["b2"],
        capacity=8)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    assert float(aux["balance_loss"]) == 0.0
    # with capacity = T every expert takes every token -> y = sum_e p_e*f_e(x)
    y_full, _ = moe_ops.moe_forward_expert_choice(
        x, p["router_w"], p["router_b"], p["w1"], p["b1"], p["w2"], p["b2"],
        capacity=32)
    logits = np.asarray(x @ p["router_w"] + p["router_b"])
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    want = np.zeros((32, 16), np.float32)
    for e in range(4):
        h = np.asarray(jax.nn.gelu(jnp.asarray(
            np.asarray(x) @ np.asarray(p["w1"][e]) + np.asarray(p["b1"][e])),
            approximate=False))
        o = h @ np.asarray(p["w2"][e]) + np.asarray(p["b2"][e])
        want += probs[:, e:e+1] * o
    np.testing.assert_allclose(np.asarray(y_full), want, atol=1e-3)


def test_expert_choice_grads_flow():
    p = _params(jax.random.PRNGKey(13))
    x = jax.random.normal(jax.random.PRNGKey(14), (16, 16))

    def loss(params):
        y, _ = moe_ops.moe_forward_expert_choice(
            x, params["router_w"], params["router_b"],
            params["w1"], params["b1"], params["w2"], params["b2"],
            capacity=8)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(p)
    for name in ["router_w", "w1", "w2", "b1", "b2"]:
        assert float(jnp.abs(g[name]).sum()) > 0, name


@pytest.mark.parametrize("capacity_factor", [2.0, 0.75, 0.25])
def test_capacity_fused_matches_scatter_capacity(capacity_factor):
    """The counting-sort capacity path must reproduce the scatter-based
    capacity buffers exactly: same token-major drop priority, same outputs,
    same gradients (including zero gradient through dropped pairs)."""
    key = jax.random.PRNGKey(11)
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(12), (37, 16))

    y_ref, aux_ref = moe_ops.moe_forward(
        x, capacity_factor=capacity_factor, top_k=2, **p)
    y_f, aux_f = moe_ops.moe_forward_fused(
        x, capacity_factor=capacity_factor, top_k=2, **p)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=2e-5)
    np.testing.assert_allclose(float(aux_f["drop_fraction"]),
                               float(aux_ref["drop_fraction"]), atol=1e-6)

    def loss(fn):
        def f(x, w1, b2):
            y, _ = fn(x, p["router_w"], p["router_b"], w1, p["b1"],
                      p["w2"], b2, top_k=2, capacity_factor=capacity_factor)
            return jnp.sum(y ** 2)
        return f

    g_ref = jax.grad(loss(moe_ops.moe_forward), argnums=(0, 1, 2))(
        x, p["w1"], p["b2"])
    g_f = jax.grad(loss(moe_ops.moe_forward_fused), argnums=(0, 1, 2))(
        x, p["w1"], p["b2"])
    for a, e, nm in zip(g_f, g_ref, ("dx", "dw1", "db2")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=5e-5,
                                   err_msg=nm)


@pytest.mark.parametrize("capacity", [None, 700])
def test_defer_dw_backward_matches_base(capacity, monkeypatch):
    """SSMV_DEFER_DW=1 pairs consecutive same-expert tiles' dw GEMMs through
    VMEM scratch (one K=2*TILE_ROWS flush). Gradients must match the default
    backward for dropless (dynamic e_of_tile) AND capacity (concrete, ODD
    per-expert tile counts: 700 -> Cp=768 = 3 tiles) layouts. Expert 0 is
    skewed to own >=4 row tiles (paired flushes), expert 2 is starved
    (min-tile padding -> single-flush path zeroing the stale scratch half).

    A spy on fused_ffn._bwd asserts each grad call actually took the path it
    claims to measure — without it, a regressed env-var gate in _ffn_bwd
    would compare the base backward against itself and pass vacuously."""
    from slim_switch_moe_vit_tpu.ops import fused_ffn

    p = _params(jax.random.PRNGKey(31), E=3)
    p["router_b"] = jnp.asarray([4.0, 0.0, -1e9])
    x = jax.random.normal(jax.random.PRNGKey(32), (400, 16))
    argnums = (0, 1, 2, 3)

    def loss_fused(w1, b1, w2, b2):
        y, _ = moe_ops.moe_forward_fused(
            x, p["router_w"], p["router_b"], w1, b1, w2, b2, top_k=2,
            capacity=capacity)
        return jnp.sum(y ** 2)

    seen_defer = []
    real_bwd = fused_ffn._bwd

    def spy_bwd(*args, **kwargs):
        seen_defer.append(kwargs.get("defer_dw", False))
        return real_bwd(*args, **kwargs)

    monkeypatch.setattr(fused_ffn, "_bwd", spy_bwd)

    grad = jax.grad(loss_fused, argnums=argnums)
    g_base = grad(p["w1"], p["b1"], p["w2"], p["b2"])
    assert seen_defer and not any(seen_defer), seen_defer
    seen_defer.clear()
    monkeypatch.setenv("SSMV_DEFER_DW", "1")
    g_defer = jax.grad(loss_fused, argnums=argnums)(
        p["w1"], p["b1"], p["w2"], p["b2"])
    assert seen_defer and all(seen_defer), \
        f"deferred-dw path not taken: {seen_defer}"
    for a, e, nm in zip(g_defer, g_base, ("dw1", "db1", "dw2", "db2")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=2e-5,
                                   err_msg=f"{nm} capacity={capacity}")
    # the starved expert's gradient is exactly zero in both modes
    assert float(jnp.abs(jnp.asarray(g_defer[0])[2]).max()) == 0.0


def test_zero_token_expert():
    """An expert that receives ZERO tokens must still own >=1 layout tile.

    The fused backward writes each expert's dw output window only at tiles it
    owns (ops/fused_ffn.py::_bwd out_specs index on e_of_tile) — an expert
    absent from e_of_tile would leave its dw block UNINITIALIZED on real TPU
    (interpret mode zero-fills, hiding it). aligned_expert_layout therefore
    pads every expert to a minimum of one tile; the pure-padding tile carries
    zero combine weight so the empty expert's gradient is exactly zero.
    """
    E = 4
    # tokens choose only experts 0 and 2 — experts 1 and 3 are empty
    flat = np.array([0, 2] * 12, dtype=np.int32).reshape(-1, 2)
    gate_w = jnp.ones(flat.shape, jnp.float32) * 0.5
    for capacity in (None, 8):
        gather_idx, pair_slot, e_of_tile, w_slot, keep = (
            moe_ops.aligned_expert_layout(
                jnp.asarray(flat), E, tile=8, gate_w=gate_w,
                weight_dtype=jnp.float32, capacity=capacity))
        present = set(np.asarray(e_of_tile).tolist())
        assert present == set(range(E)), (capacity, sorted(present))

    # end-to-end: fused path with a router that starves expert 1 -> its
    # gradients are exactly zero, all others match the dense oracle
    p = _params(jax.random.PRNGKey(21))
    p["router_b"] = p["router_b"].at[1].set(-1e9)
    x = jax.random.normal(jax.random.PRNGKey(22), (24, 16))

    def loss_fused(w1, w2):
        y, _ = moe_ops.moe_forward_fused(
            x, p["router_w"], p["router_b"], w1, p["b1"], w2, p["b2"],
            top_k=2)
        return jnp.sum(y ** 2)

    def loss_dense(w1, w2):
        y = moe_ops.moe_dense(
            x, p["router_w"], p["router_b"], w1, p["b1"], w2, p["b2"],
            top_k=2)
        return jnp.sum(y ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1))(p["w1"], p["w2"])
    g_d = jax.grad(loss_dense, argnums=(0, 1))(p["w1"], p["w2"])
    for a, e, nm in zip(g_f, g_d, ("dw1", "dw2")):
        assert float(jnp.abs(jnp.asarray(a)[1]).max()) == 0.0, nm
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=5e-5,
                                   err_msg=nm)


def test_layout_rows_policy_and_512_layout_parity(monkeypatch):
    """layout_rows_policy (VERDICT r4 #3): env override + auto threshold,
    and the 512-row dropless layout through moe_forward_fused must match the
    256-row layout bit-for-bit in outputs AND grads (the e_of_tile repeat +
    layout_rows plumbing at ops/moe.py::moe_forward_fused)."""
    from slim_switch_moe_vit_tpu.ops import fused_ffn
    from slim_switch_moe_vit_tpu.ops.fused_ffn import LAYOUT_ROWS, TILE_ROWS
    from slim_switch_moe_vit_tpu.ops.moe import (
        _LAYOUT_512_MIN_TK, layout_rows_policy,
    )

    # policy unit behavior
    monkeypatch.delenv("SSMV_LAYOUT_ROWS", raising=False)
    assert layout_rows_policy(_LAYOUT_512_MIN_TK - 1, 8) == TILE_ROWS
    assert layout_rows_policy(_LAYOUT_512_MIN_TK, 8) == LAYOUT_ROWS
    monkeypatch.setenv("SSMV_LAYOUT_ROWS", "512")
    assert layout_rows_policy(1, 8) == LAYOUT_ROWS
    monkeypatch.setenv("SSMV_LAYOUT_ROWS", "256")
    assert layout_rows_policy(10**9, 8) == TILE_ROWS
    monkeypatch.setenv("SSMV_LAYOUT_ROWS", "384")
    with pytest.raises(ValueError):
        layout_rows_policy(1, 8)

    # end-to-end parity, with a spy proving each run took its claimed layout
    p = _params(jax.random.PRNGKey(41), E=3)
    x = jax.random.normal(jax.random.PRNGKey(42), (700, 16))
    seen = []
    real = fused_ffn.fused_expert_ffn

    def spy(xs, w1, b1, w2, b2, e_of_tile, dy_scale=None,
            layout_rows=TILE_ROWS):
        seen.append((xs.shape[0], len(e_of_tile), layout_rows))
        return real(xs, w1, b1, w2, b2, e_of_tile, dy_scale=dy_scale,
                    layout_rows=layout_rows)

    # moe_forward_fused imports the kernel lazily from fused_ffn — patch it
    # at its home module
    monkeypatch.setattr(fused_ffn, "fused_expert_ffn", spy)

    def run(layout):
        monkeypatch.setenv("SSMV_LAYOUT_ROWS", str(layout))

        def loss(x, w1, b2):
            y, _ = moe_ops.moe_forward_fused(
                x, p["router_w"], p["router_b"], w1, p["b1"], p["w2"], b2,
                top_k=2)
            return jnp.sum(y ** 2), y

        (_, y), g = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                       has_aux=True)(x, p["w1"], p["b2"])
        return y, g

    y256, g256 = run(256)
    y512, g512 = run(512)
    rows256, n_et256, lr256 = seen[0]
    rows512, n_et512, lr512 = seen[-1]
    assert lr256 == TILE_ROWS and lr512 == LAYOUT_ROWS
    assert rows512 % LAYOUT_ROWS == 0 and n_et512 == rows512 // TILE_ROWS
    assert rows512 >= rows256  # 512 layout pads more, never less
    np.testing.assert_allclose(np.asarray(y512), np.asarray(y256), atol=2e-5)
    for a, e, nm in zip(g512, g256, ("dx", "dw1", "db2")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=5e-5,
                                   err_msg=nm)
