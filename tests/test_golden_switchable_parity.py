"""Golden parity for the switchable subsystem (SURVEY 2.5/2.6) vs the torch
oracle: SwitchableLayerNorm centroid bucket selection + per-bucket affine,
through full-model training.

The jax rebuild replaced the reference's per-bucket boolean-mask loop
(layers.py:144-149) with ONE gather over the bucket dim; this test pins that
rewrite's value AND gradient equality (AdamW steps must track) against an
index_select torch restatement. The routing/truncation mode is excluded from
golden scope — the reference's routing indexing is acknowledged buggy
research code (SURVEY 2.23); its intended semantics are covered by
tests/test_switchable_sparse.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import (  # noqa: E402
    OracleSwitchableViT,
    load_from_flax_switchable,
    train_losses_switchable,
)

STEPS = 6
LR = 1e-3
BUCKETS = 4


def _jitter_router(params, seed=9):
    """Spread the per-bucket affine away from the shared ones/zeros init so
    bucket selection is observable in the output."""
    rng = np.random.RandomState(seed)
    router = dict(params["router"])
    router["weights"] = jnp.asarray(
        1.0 + 0.2 * rng.randn(*router["weights"].shape).astype(np.float32))
    router["biases"] = jnp.asarray(
        0.2 * rng.randn(*router["biases"].shape).astype(np.float32))
    return {**params, "router": router}


def test_switchable_centroid_training_matches_oracle():
    import optax

    from slim_switch_moe_vit_tpu import create_model, losses
    from slim_switch_moe_vit_tpu.models.switchable import (
        CENTROID_COLLECTION,
        SwitchableLayerNorm,
    )

    model = create_model("deit_sw_tiny_patch16_224", num_classes=10,
                         img_size=32, buckets=BUCKETS,
                         collect_embeddings=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)), deterministic=True)
    params = _jitter_router(variables["params"])

    rs = np.random.RandomState(13)
    centroids = (rs.randn(BUCKETS, 192) * 0.5).astype(np.float32)
    variables = SwitchableLayerNorm.set_centroids(
        {**variables, "params": params}, ("router",), jnp.asarray(centroids))
    cent_col = variables[CENTROID_COLLECTION]

    oracle = OracleSwitchableViT(num_classes=10, buckets=BUCKETS)
    load_from_flax_switchable(oracle, jax.tree.map(np.asarray, params),
                              centroids)

    images = rs.randn(2, 8, 32, 32, 3).astype(np.float32)
    labels = rs.randint(0, 10, (2, 8))

    # --- init parity: logits + the actual bucket selection ---------------
    out, pre_x = model.apply(
        {"params": params, CENTROID_COLLECTION: cent_col},
        jnp.asarray(images[0]), deterministic=True)
    t_logits, t_selected = oracle(torch.from_numpy(images[0]))
    np.testing.assert_allclose(np.asarray(out),
                               t_logits.detach().numpy(), atol=3e-5)
    # recompute selection from pre-router activations (the reference's
    # ||x - c||^2 argmin, layers.py:134-140) and require 3-way agreement
    px = np.asarray(pre_x, np.float32)
    d = ((px ** 2).sum(-1, keepdims=True) - 2.0 * px @ centroids.T
         + (centroids ** 2).sum(-1))
    np_selected = d.argmin(-1)
    np.testing.assert_array_equal(np_selected, t_selected.numpy())
    assert len(np.unique(np_selected)) > 1, \
        "test is vacuous unless multiple buckets are actually selected"

    # --- training parity --------------------------------------------------
    crit = losses.make_base_criterion(False, 0.1, False)
    tx = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits, _ = model.apply(
                {"params": p, CENTROID_COLLECTION: cent_col}, x,
                deterministic=True)
            return crit(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for s in range(STEPS):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images[s % 2]),
            jnp.asarray(labels[s % 2]))
        jax_losses.append(float(loss))

    torch_losses = train_losses_switchable(oracle, images, labels, STEPS, LR)
    # soft math only (argmin selection is non-differentiable on both sides):
    # curves track to float noise
    for s in range(STEPS):
        np.testing.assert_allclose(
            jax_losses[s], torch_losses[s], rtol=5e-4,
            err_msg=f"step {s}: jax={jax_losses} torch={torch_losses}")
    assert jax_losses[-1] < jax_losses[0]

    # the per-bucket affine params took the same gradient path on both
    # sides (gather VJP vs torch index backward)
    np.testing.assert_allclose(
        np.asarray(params["router"]["weights"]),
        oracle.router.weights.detach().numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(params["router"]["biases"]),
        oracle.router.biases.detach().numpy(), atol=2e-4)
