"""Model forward-pass and gate-semantics tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slim_switch_moe_vit_tpu.models import create_model, list_models
from slim_switch_moe_vit_tpu.models.gates import (
    TokenGate, apply_epoch_anneal, build_anneal_plan, disable_all, gate_paths,
)


def _init_and_forward(model, B=2, size=32, train=False, num_classes=10):
    x = jnp.ones((B, size, size, 3))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, deterministic=True)
    out = model.apply(
        variables, x, deterministic=not train,
        rngs={"dropout": jax.random.PRNGKey(2)} if train else None,
        mutable=["moe_metrics"] if train else False,
    )
    if train:
        out = out[0]
    return variables, out


def test_deit_tiny_forward_shape():
    model = create_model("deit_tiny_patch16_224", num_classes=10, img_size=32)
    _, out = _init_and_forward(model)
    assert out.shape == (2, 10)


def test_deit_distilled_train_returns_two_heads():
    model = create_model(
        "deit_tiny_distilled_patch16_224", num_classes=10, img_size=32
    )
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True,
    )
    out = model.apply(variables, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert isinstance(out, tuple) and out[0].shape == (2, 10)
    # Eval: averaged heads -> single tensor
    out_eval = model.apply(variables, x, deterministic=True)
    assert out_eval.shape == (2, 10)


def test_resmoe_tiny_forward_and_metrics():
    model = create_model(
        "resmoe_tiny_patch16_224_expert8", num_classes=10, img_size=32,
        starting_threshold=1.0, target_threshold=0.9,
    )
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True,
    )
    assert "gates" in variables
    out, mut = model.apply(
        variables, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["moe_metrics"],
    )
    assert out.shape == (2, 10)
    assert "moe_metrics" in mut
    # 12 blocks x 2 gates each in the gates collection
    assert len(gate_paths(variables["gates"])) == 24


def test_moe_tiny_forward():
    model = create_model("moe_tiny_patch16_224_expert8", num_classes=10, img_size=32)
    _, out = _init_and_forward(model)
    assert out.shape == (2, 10)


def test_gate_disabled_passes_all_tokens():
    gate = TokenGate(starting_threshold=0.0, target_threshold=0.0)
    x = jnp.ones((2, 5, 8))
    variables = gate.init(jax.random.PRNGKey(0), x, deterministic=True)
    gates = disable_all(variables["gates"])
    mask = gate.apply({**variables, "gates": gates}, x, deterministic=False,
                      mutable=["moe_metrics"])[0]
    np.testing.assert_allclose(np.asarray(mask[..., 1]), 1.0)
    np.testing.assert_allclose(np.asarray(mask[..., 0]), 0.0)


def test_gate_threshold_semantics():
    # threshold 1.0 -> sigmoid can never exceed it -> nothing skipped
    gate = TokenGate(starting_threshold=1.0, target_threshold=1.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
    variables = gate.init(jax.random.PRNGKey(0), x, deterministic=True)
    mask = gate.apply(variables, x, deterministic=False,
                      mutable=["moe_metrics"])[0]
    np.testing.assert_allclose(np.asarray(mask[..., 1]), 1.0)
    # threshold 0.0 at eval -> everything skipped
    gate0 = TokenGate(starting_threshold=0.0, target_threshold=0.0)
    variables0 = gate0.init(jax.random.PRNGKey(0), x, deterministic=True)
    mask0 = gate0.apply(variables0, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(mask0[..., 0]), 1.0)


def test_gate_ste_gradients():
    gate = TokenGate(starting_threshold=0.5, target_threshold=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8))
    variables = gate.init(jax.random.PRNGKey(0), x, deterministic=True)

    def f(params):
        mask = gate.apply({"params": params, "gates": variables["gates"]},
                          x, deterministic=False, mutable=["moe_metrics"])[0]
        return jnp.sum(mask[..., 1])

    g = jax.grad(f)(variables["params"])
    # STE: gradient must flow into the gate head despite the hard threshold
    assert float(jnp.abs(g["head"]["kernel"]).sum()) > 0


def test_anneal_plan_and_step():
    model = create_model(
        "resmoe_tiny_patch16_224_expert8", num_classes=10, img_size=32,
        starting_threshold=1.0, target_threshold=0.8,
    )
    x = jnp.ones((1, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True,
    )
    gates = disable_all(variables["gates"])
    plan = build_anneal_plan(gates, epochs=100, warmup_epochs=5, epoch_offset=2)
    paths = gate_paths(gates)
    assert set(plan) == set(paths)
    # before its start epoch, a late gate stays disabled
    gates2 = apply_epoch_anneal(gates, plan, epoch=5)
    first, last = paths[0], paths[-1]

    def get(tree, path, leaf):
        for k in path:
            tree = tree[k]
        return float(tree[leaf])

    assert get(gates2, first, "enabled") == 1.0
    assert get(gates2, last, "enabled") == 0.0
    assert get(gates2, first, "threshold") < 1.0
    # annealing clamps at target
    for e in range(5, 300):
        gates2 = apply_epoch_anneal(gates2, plan, epoch=e)
    assert abs(get(gates2, first, "threshold") - 0.8) < 1e-6


def test_registry_lists_reference_names():
    names = list_models()
    for n in [
        "deit_tiny_patch16_224", "deit_base_patch16_384",
        "deit_base_distilled_patch16_384",
        "resmoe_tiny_patch16_224_expert8", "moe_tiny_patch16_224_expert8",
    ]:
        assert n in names


def test_registry_covers_all_reference_vit_registrations():
    """All 38 names registered by reference models/vision_transformer.py
    (1083-1490): 14 classic, 8 deit, 8 in21k, 2 miil."""
    names = set(list_models())
    in21k = [
        "vit_tiny_patch16_224_in21k", "vit_small_patch32_224_in21k",
        "vit_small_patch16_224_in21k", "vit_base_patch32_224_in21k",
        "vit_base_patch16_224_in21k", "vit_large_patch32_224_in21k",
        "vit_large_patch16_224_in21k", "vit_huge_patch14_224_in21k",
    ]
    miil = ["vit_base_patch16_224_miil_in21k", "vit_base_patch16_224_miil"]
    for n in in21k + miil:
        assert n in names, n


def test_in21k_default_head_and_prelogits():
    # default 21k head (vision_transformer.py default_cfgs num_classes=21843)
    m = create_model("vit_tiny_patch16_224_in21k", img_size=32)
    variables, out = _init_and_forward(m)
    assert out.shape == (2, 21843)
    # huge/large-p32 in21k carry the representation layer; use a shrunken
    # config to keep the test cheap (representation_size passes through)
    m2 = create_model("vit_large_patch32_224_in21k", img_size=32,
                      num_classes=7)
    assert m2.representation_size == 1024
    from slim_switch_moe_vit_tpu.models.vit import VisionTransformer
    tiny = VisionTransformer(img_size=32, patch_size=16, num_classes=7,
                             embed_dim=64, depth=1, num_heads=2,
                             representation_size=48)
    x = jnp.ones((2, 32, 32, 3))
    v = tiny.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    assert v["params"]["pre_logits"]["kernel"].shape == (64, 48)
    assert v["params"]["head"]["kernel"].shape == (48, 7)
    out = tiny.apply(v, x, deterministic=True)
    assert out.shape == (2, 7)
    # num_classes=0 returns the tanh'd representation feature
    # (vision_transformer.py:833)
    feat_model = VisionTransformer(img_size=32, patch_size=16, num_classes=0,
                                   embed_dim=64, depth=1, num_heads=2,
                                   representation_size=48)
    v0 = feat_model.init({"params": jax.random.PRNGKey(0)}, x,
                         deterministic=True)
    f = feat_model.apply(v0, x, deterministic=True)
    assert f.shape == (2, 48)
    assert float(jnp.max(jnp.abs(f))) <= 1.0 + 1e-6


def test_miil_has_no_qkv_bias():
    m = create_model("vit_base_patch16_224_miil", num_classes=10, img_size=32)
    assert m.qkv_bias is False
    v, out = _init_and_forward(m)
    assert out.shape == (2, 10)
    assert "bias" not in v["params"]["blocks_0"]["attn"]["qkv"]
