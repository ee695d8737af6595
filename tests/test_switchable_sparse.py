"""Switchable ViT (bucketed router + truncation) and sparse-pruning tests."""
import jax
import jax.numpy as jnp
import numpy as np

from slim_switch_moe_vit_tpu.models import create_model
from slim_switch_moe_vit_tpu.models.switchable import (
    SwitchableLayerNorm, SwitchableVisionTransformer,
)
from slim_switch_moe_vit_tpu.models import sparse as sp


def test_switchable_ln_single_bucket_matches_layernorm():
    ln = SwitchableLayerNorm(features=8, switchable_buckets=1, eps=1e-6)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
    variables = ln.init(jax.random.PRNGKey(1), x)
    y, buckets = ln.apply(variables, x)
    # plain layernorm oracle (ones/zeros affine)
    mean = np.mean(np.asarray(x), -1, keepdims=True)
    var = np.var(np.asarray(x), -1, keepdims=True)
    want = (np.asarray(x) - mean) / np.sqrt(var + 1e-6)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)
    assert (np.asarray(buckets) == 0).all()


def test_switchable_ln_bucket_selection_by_centroid():
    ln = SwitchableLayerNorm(features=4, switchable_buckets=2)
    x = jnp.array([[[10.0, 10, 10, 10], [-10, -10, -10, -10]]])
    variables = ln.init(jax.random.PRNGKey(0), x)
    cents = jnp.array([[10.0, 10, 10, 10], [-10, -10, -10, -10]])
    variables = SwitchableLayerNorm.set_centroids(dict(variables), ("centroids",)[:0] or (), cents) \
        if False else {**variables, "centroids": {"centroids": cents}}
    y, buckets = ln.apply(variables, x)
    assert buckets.tolist() == [[0, 1]]
    # explicit bucket overrides selection
    _, b2 = ln.apply(variables, x, buckets=1)
    assert b2.tolist() == [[1, 1]]


def test_switchable_ln_per_bucket_affine():
    ln = SwitchableLayerNorm(features=4, switchable_buckets=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4))
    variables = ln.init(jax.random.PRNGKey(1), x)
    params = dict(variables["params"])
    params["weights"] = jnp.stack([jnp.ones(4), jnp.full((4,), 2.0)])
    params["biases"] = jnp.stack([jnp.zeros(4), jnp.full((4,), 5.0)])
    v = {**variables, "params": params}
    y0, _ = ln.apply(v, x, buckets=0)
    y1, _ = ln.apply(v, x, buckets=1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0) * 2 + 5,
                               atol=1e-5)


def test_switchable_vit_forward_and_routing():
    model = create_model("deit_sw_tiny_patch16_224", num_classes=10,
                         img_size=32, buckets=2, route_capacity=3)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True)
    out = model.apply(variables, x, deterministic=True)
    assert out.shape == (2, 10)
    out_routed = model.apply(variables, x, routing=True, threshold=1,
                             deterministic=True)
    assert out_routed.shape == (2, 10)
    # routing with threshold 0 (all buckets pass) but capped capacity differs
    out_routed0 = model.apply(variables, x, routing=True, threshold=0,
                              deterministic=True)
    assert np.isfinite(np.asarray(out_routed0)).all()


def test_sparse_model_forward_and_compress_cycle():
    model = create_model("sparse_deit_tiny_patch16_224", num_classes=10,
                         img_size=32)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True)
    assert sp.PRUNING_COLLECTION in variables
    out = model.apply(variables, x, deterministic=True)
    assert out.shape == (2, 10)

    params, pruning = variables["params"], variables[sp.PRUNING_COLLECTION]
    mods = list(sp._walk_sparse_modules(params))
    assert len(mods) == 24  # 12 attn + 12 mlp

    za, zm, zp = sp.give_zetas(params)
    assert len(za) == 12 * 3 * 64 and len(zm) == 12 * 768
    assert len(zp) == 12 * ((32 // 16) ** 2 + 1)

    la, lm, lp = sp.get_sparsity_loss(params)
    assert float(la) > 0 and float(lm) > 0 and float(lp) > 0

    # randomize zetas so percentile thresholds actually bite (at init all
    # zetas are 1.0 and compress keeps everything, faithfully to reference)
    rng = np.random.RandomState(0)

    def jitter(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = jitter(v)
            elif k in ("zeta", "patch_zeta"):
                out[k] = jnp.asarray(rng.rand(*v.shape).astype(np.float32))
            else:
                out[k] = v
        return out

    params = jitter(params)

    new_pruning, (ta, tm, _) = sp.compress(params, pruning, 0.5, 0.5, 0.5)
    ra, rm, rp = sp.get_remaining(params, new_pruning, (32 // 16) ** 2 + 1)
    assert 0.4 <= ra <= 0.6 and 0.4 <= rm <= 0.6
    # patch OR-propagation: earlier blocks keep at least as many patches
    first = None
    last = None
    for path, kind in sp._walk_sparse_modules(params):
        if kind != "attn":
            continue
        m = np.asarray(sp._get(new_pruning, path)["searched_patch_zeta"])
        if first is None:
            first = m
        last = m
    assert first.sum() >= last.sum()

    out_c = model.apply({**variables, sp.PRUNING_COLLECTION: new_pruning},
                        x, deterministic=True)
    assert np.isfinite(np.asarray(out_c)).all()

    restored = sp.decompress(new_pruning)
    out_d = model.apply({**variables, sp.PRUNING_COLLECTION: restored},
                        x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out),
                               atol=1e-5)


def test_sparse_flops_accounting():
    total, active = sp.sparse_attention_flops(
        192, 3, np.ones((1, 1, 3, 1, 64)), 197, 197.0)
    assert active <= total
    t2, a2 = sp.sparse_attention_flops(
        192, 3, np.concatenate([np.ones((1, 1, 2, 1, 64)),
                                np.zeros((1, 1, 1, 1, 64))], axis=2),
        197, 197.0)
    assert a2 < t2
    tm, am = sp.sparse_mlp_params_count(192, 768, np.ones((1, 1, 768)))
    assert tm == am
