"""Learned token-skip gates with straight-through estimators.

TPU-native rebuild of the reference ``Gate`` (``models/resMoE.py:32-85``):
a 1-unit linear head → sigmoid probability; a token is SKIPPED when
``prob > threshold``. Hard masks use straight-through estimators exactly as the
reference writes them (``resMoE.py:76-77``):

    skip = (prob > thr) + stop_grad(1-prob) - (1-prob)   # value hard, grad +dprob
    keep = (prob <= thr) + stop_grad(prob) - prob        # value hard, grad -dprob

Differences forced by jit (and how they're bridged):
- the annealed threshold is a float32 variable in the ``gates`` collection
  (reference: a ``_threshold`` buffer mutated by ``Gate.step``, annealed from
  the trainer ``main.py:808-820,886-891``); the trainer updates it functionally
  between epochs via ``anneal`` below.
- the ``disable`` python flag becomes an ``enabled`` 0/1 variable selected with
  ``jnp.where`` so toggling never recompiles.
- skip-rate counters (reference ``_total_tokens``/``_skipped_tokens``) are sown
  into the ``moe_metrics`` collection instead of python attrs.

Eval uses the target threshold, train the annealed one (reference
``resMoE.py:68``).
"""
from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dense

GATE_COLLECTION = "gates"
METRICS_COLLECTION = "moe_metrics"


class TokenGate(nn.Module):
    tau: float = 1.0  # kept for reference-ctor parity (unused in forward there too)
    dropout: float = 0.0
    starting_threshold: float = 1.0
    target_threshold: float = 0.9
    is_hard: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, N, d) → mask (B, N, 2): [..., 0]=skip weight, [..., 1]=keep."""
        thr = self.variable(
            GATE_COLLECTION, "threshold",
            lambda: jnp.asarray(self.starting_threshold, jnp.float32),
        )
        target = self.variable(
            GATE_COLLECTION, "target_threshold",
            lambda: jnp.asarray(self.target_threshold, jnp.float32),
        )
        enabled = self.variable(
            GATE_COLLECTION, "enabled", lambda: jnp.asarray(1.0, jnp.float32)
        )

        h = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        out = Dense(1, dtype=jnp.float32, name="head")(h.astype(jnp.float32))
        prob = jax.nn.sigmoid(out)  # (B, N, 1)
        nprob = 1.0 - prob

        threshold = jnp.where(deterministic, target.value, thr.value)

        if (not deterministic) and (not self.is_hard):
            skip, keep = nprob, prob
        else:
            hard_skip = (prob > threshold).astype(jnp.float32)
            hard_keep = 1.0 - hard_skip
            skip = hard_skip + jax.lax.stop_gradient(nprob) - nprob
            keep = hard_keep + jax.lax.stop_gradient(prob) - prob

        # Disabled gate passes every token (reference resMoE.py:60-63).
        en = enabled.value
        skip = skip * en
        keep = keep * en + (1.0 - en)

        self.sow(
            METRICS_COLLECTION, "skip_fraction",
            jnp.mean(jax.lax.stop_gradient(skip)),
            reduce_fn=lambda a, b: b, init_fn=lambda: jnp.asarray(0.0),
        )
        return jnp.concatenate([skip, keep], axis=-1)


# ---------------------------------------------------------------------------
# Trainer-side threshold annealing (functional equivalents of Gate.step and the
# per-task schedule in main.py:808-820,886-891).
# ---------------------------------------------------------------------------

def gate_paths(gate_vars: dict) -> typ.List[typ.Tuple[str, ...]]:
    """All module paths in a ``gates`` collection that hold a threshold."""
    paths = []

    def walk(tree, prefix):
        if isinstance(tree, dict):
            if "threshold" in tree and "target_threshold" in tree:
                paths.append(prefix)
                return
            for k in sorted(tree):
                walk(tree[k], prefix + (k,))

    walk(gate_vars, ())
    return paths


def build_anneal_plan(gate_vars: dict, epochs: int, warmup_epochs: int,
                      epoch_offset: float) -> dict:
    """Per-gate (delta, start_epoch), matching main.py:808-820: the i-th gate
    starts at ``warmup + i*offset`` and anneals from its current threshold to
    target in ``epochs - warmup - i*offset`` steps."""
    plan = {}
    for i, path in enumerate(gate_paths(gate_vars)):
        node = _get(gate_vars, path)
        start = float(node["threshold"])
        target = float(node["target_threshold"])
        denom = epochs - warmup_epochs - epoch_offset * i
        delta = (start - target) / denom if denom > 0 else (start - target)
        plan[path] = (delta, warmup_epochs + epoch_offset * i)
    return plan


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def set_enabled(gate_vars: dict, path: typ.Tuple[str, ...], value: float) -> dict:
    node = dict(_get(gate_vars, path))
    node["enabled"] = jnp.asarray(value, jnp.float32)
    return _set(gate_vars, path, node)


def anneal(gate_vars: dict, path: typ.Tuple[str, ...], delta: float) -> dict:
    """threshold <- max(threshold - delta, target) (reference Gate.step,
    resMoE.py:53-57)."""
    node = dict(_get(gate_vars, path))
    node["threshold"] = jnp.maximum(
        node["threshold"] - delta, node["target_threshold"]
    )
    return _set(gate_vars, path, node)


def apply_epoch_anneal(gate_vars: dict, plan: dict, epoch: int) -> dict:
    """Enable + step every gate whose start epoch has arrived
    (reference main.py:887-891)."""
    for path, (delta, start) in plan.items():
        if epoch >= start:
            gate_vars = set_enabled(gate_vars, path, 1.0)
            gate_vars = anneal(gate_vars, path, delta)
    return gate_vars


def disable_all(gate_vars: dict) -> dict:
    """Disable every gate at task start (reference main.py:819)."""
    for path in gate_paths(gate_vars):
        gate_vars = set_enabled(gate_vars, path, 0.0)
    return gate_vars


def _set(tree, path, value):
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _set(tree[path[0]], path[1:], value)
    return out
