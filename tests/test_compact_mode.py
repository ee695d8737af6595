"""Compact token-skip mode: gathered short-sequence execution."""
import jax
import jax.numpy as jnp
import numpy as np

from slim_switch_moe_vit_tpu.models import create_model
from slim_switch_moe_vit_tpu.models.gates import disable_all


def _build(mode, capacity=1.0, img=96):
    # img 96 -> 37 tokens, so fractional capacities actually truncate
    model = create_model(
        "resmoe_tiny_patch16_224_expert8", num_classes=10, img_size=img,
        resmoe_mode=mode, token_capacity=capacity,
        starting_threshold=1.0, target_threshold=0.9,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, img, img, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, deterministic=True)
    return model, variables, x


def test_compact_full_capacity_matches_parity_when_all_kept():
    """threshold 1.0: sigmoid can't exceed it, every token is kept; with
    capacity 1.0 compact must equal parity numerically (same tokens, and
    kept tokens attend over the full set)."""
    mp, vp, x = _build("parity")
    mc, vc, _ = _build("compact", capacity=1.0)
    # same init seeds -> same params
    out_p = mp.apply(vp, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(3)},
                     mutable=["moe_metrics"])[0]
    out_c = mc.apply(vc, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(3)},
                     mutable=["moe_metrics"])[0]
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_c),
                               atol=2e-4)


def test_compact_reduced_capacity_runs_and_differs():
    mc, vc, x = _build("compact", capacity=0.5)
    out = mc.apply(vc, x, deterministic=True)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()
    m1, v1, _ = _build("compact", capacity=1.0)
    out_full = m1.apply(v1, x, deterministic=True)
    # truncation must change the result (tokens were cut)
    assert np.abs(np.asarray(out) - np.asarray(out_full)).max() > 0


def test_compact_grads_flow_through_gates():
    mc, vc, x = _build("compact", capacity=0.5)

    def loss(params):
        out = mc.apply({**vc, "params": params}, x, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(4)},
                       mutable=["moe_metrics"])[0]
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(vc["params"])
    gate_g = g["blocks_0"]["dense_gate"]["head"]["kernel"]
    assert float(jnp.abs(gate_g).sum()) > 0


def test_compact_with_disabled_gates_keeps_all():
    mc, vc, x = _build("compact", capacity=1.0)
    gates = disable_all(vc["gates"])
    out = mc.apply({**vc, "gates": gates}, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(5)},
                   mutable=["moe_metrics"])[0]
    assert np.isfinite(np.asarray(out)).all()
