"""Golden parity for the sparse-pruning subsystem (SURVEY 2.7/2.8) vs the
torch oracle: search-phase training (task loss + L1 zeta loss), percentile
compression with patch-mask OR propagation, and the compressed forward.

Unlike the gated/capacity golden configs there is NO discrete mechanism in
the search phase (zetas are soft multiplicative masks), so the two loss
curves must track to float noise the whole way — and the compressed masks
must agree ELEMENT-EXACTLY (both sides compute the same percentile
thresholds over near-identical zetas; the jittered init separates zeta
values by ~4e-4, far above the ~1e-6 training drift).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import (  # noqa: E402
    OracleSparseViT,
    load_from_flax_sparse,
    smoothed_ce,
    sparse_compress,
    sparse_sparsity_loss,
    train_losses_sparse,
)

STEPS = 6
LR = 1e-3
W_SPARSE = 2e-4
BUDGETS = (0.5, 0.6, 0.7)  # attn, mlp, patch


def _jitter_zetas(params, seed=5):
    """Spread the all-ones zeta init over [0, 1) so percentile thresholds
    bite and mask comparisons are well-separated (same trick as
    tests/test_switchable_sparse.py — at the exact init every zeta is 1.0
    and compression keeps everything)."""
    rng = np.random.RandomState(seed)

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k in ("zeta", "patch_zeta"):
                out[k] = jnp.asarray(rng.rand(*v.shape).astype(np.float32))
            else:
                out[k] = v
        return out

    return walk(params)


@pytest.fixture(scope="module")
def trained_pair():
    import optax

    from slim_switch_moe_vit_tpu import create_model, losses
    from slim_switch_moe_vit_tpu.models import sparse as sp

    model = create_model("sparse_deit_tiny_patch16_224", num_classes=10,
                         img_size=32)
    x0 = jnp.zeros((1, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, deterministic=True)
    params = _jitter_zetas(variables["params"])
    pruning = variables[sp.PRUNING_COLLECTION]

    oracle = OracleSparseViT(num_classes=10)
    load_from_flax_sparse(oracle, jax.tree.map(np.asarray, params))

    rs = np.random.RandomState(11)
    images = rs.randn(2, 8, 32, 32, 3).astype(np.float32)
    labels = rs.randint(0, 10, (2, 8))

    crit = losses.make_base_criterion(False, 0.1, False)
    tx = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(
                {"params": p, sp.PRUNING_COLLECTION: pruning}, x,
                deterministic=True)
            la, lm, lp = sp.get_sparsity_loss(p)
            return crit(logits, y) + W_SPARSE * (la + lm + lp)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # init forward parity before any training
    jax_logits0 = np.asarray(model.apply(
        {"params": params, sp.PRUNING_COLLECTION: pruning},
        jnp.asarray(images[0]), deterministic=True))
    torch_logits0 = oracle(torch.from_numpy(images[0])).detach().numpy()
    np.testing.assert_allclose(jax_logits0, torch_logits0, atol=3e-5)

    jax_losses = []
    for s in range(STEPS):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images[s % 2]),
            jnp.asarray(labels[s % 2]))
        jax_losses.append(float(loss))

    torch_losses = train_losses_sparse(oracle, images, labels, STEPS, LR,
                                       W_SPARSE)
    return model, sp, params, pruning, oracle, jax_losses, torch_losses, \
        images


def test_sparse_search_curve_matches_oracle(trained_pair):
    _, _, _, _, _, jax_losses, torch_losses, _ = trained_pair
    # soft masks only — no STE/capacity discreteness, so the curves track
    # to float noise all the way (like the distilled golden config)
    for s in range(STEPS):
        np.testing.assert_allclose(
            jax_losses[s], torch_losses[s], rtol=5e-4,
            err_msg=f"step {s}: jax={jax_losses} torch={torch_losses}")
    assert jax_losses[-1] < jax_losses[0]


def test_sparse_compress_matches_oracle(trained_pair):
    model, sp, params, pruning, oracle, _, _, images = trained_pair

    new_pruning, (ta_j, tm_j, _) = sp.compress(params, pruning, *BUDGETS)
    ta_t, tm_t, tp_t = sparse_compress(oracle, *BUDGETS)
    np.testing.assert_allclose(ta_j, ta_t, rtol=1e-5)
    np.testing.assert_allclose(tm_j, tm_t, rtol=1e-5)

    # element-exact mask agreement, incl. the OR-propagated patch masks
    for i, blk in enumerate(oracle.blocks):
        node = sp._get(new_pruning, (f"blocks_{i}", "attn"))
        np.testing.assert_array_equal(
            np.asarray(node["searched_zeta"]),
            blk.attn.searched_zeta.numpy(), err_msg=f"attn zeta blk {i}")
        np.testing.assert_array_equal(
            np.asarray(node["searched_patch_zeta"]),
            blk.attn.searched_patch_zeta.numpy(),
            err_msg=f"patch mask blk {i}")
        mnode = sp._get(new_pruning, (f"blocks_{i}", "mlp"))
        np.testing.assert_array_equal(
            np.asarray(mnode["searched_zeta"]),
            blk.mlp.searched_zeta.numpy(), err_msg=f"mlp zeta blk {i}")

    # compressed forward parity
    jax_logits = np.asarray(model.apply(
        {"params": params, sp.PRUNING_COLLECTION: new_pruning},
        jnp.asarray(images[0]), deterministic=True))
    torch_logits = oracle(torch.from_numpy(images[0])).detach().numpy()
    np.testing.assert_allclose(jax_logits, torch_logits, atol=2e-4)
