"""Train state pytree + construction helpers.

The reference's mutable training objects (model params, optimizer state, EMA
shadow, gate threshold buffers, RNG) become one functional pytree threaded
through a jitted step. The checkpoint payload mirrors the reference's
(``main.py:893-907``): model/optimizer/epoch/EMA (+ gates, which torch kept as
model buffers).
"""
from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    params: typ.Any
    opt_state: typ.Any
    gates: typ.Any            # gate-threshold collection ({} for dense models)
    ema_params: typ.Any       # EMA shadow pytree or None
    rng: jax.Array
    step: jax.Array


def create_train_state(model, input_shape, *, seed: int = 0,
                       opt_init: typ.Optional[typ.Callable] = None,
                       use_ema: bool = False) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    p_rng, d_rng, state_rng = jax.random.split(rng, 3)
    x = jnp.zeros(input_shape, jnp.float32)
    variables = model.init({"params": p_rng, "dropout": d_rng}, x,
                           deterministic=True)
    params = variables["params"]
    gates = variables.get("gates", {})
    opt_state = opt_init(params) if opt_init is not None else None
    ema = jax.tree.map(jnp.copy, params) if use_ema else None
    return TrainState(
        params=params, opt_state=opt_state, gates=gates, ema_params=ema,
        rng=state_rng, step=jnp.asarray(0, jnp.int32),
    )


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
