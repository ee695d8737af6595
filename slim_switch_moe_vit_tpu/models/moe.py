"""MoE MLP flax module (the reference's ``CustomizedMoEMLP``, ``resMoE.py:15-29``).

Holds the router + per-expert FFN parameters and calls the TPU-native dispatch
in ``ops/moe.py``. Expert parameters are created expert-major ``(E, ...)`` and
annotated for the ``expert`` mesh axis so pjit shards them (expert parallelism);
the dispatch buffer gets the same constraint, which makes XLA insert the
all_to_all over ICI — the equivalent of FastMoE's NCCL global exchange.

``parity_dense=True`` switches to the exact dropless computation (every expert
runs every token) for golden tests against the FastMoE semantics.
"""
from __future__ import annotations

import typing as typ

import jax.numpy as jnp
from flax import linen as nn

from ..ops import moe as moe_ops
from ..parallel.sharding import EXPERT_AXIS, constrain
from .layers import trunc_normal_init
from .gates import METRICS_COLLECTION


class MoEMlp(nn.Module):
    """dispatch_mode:
    - 'auto' (default): 'fused' on TPU, 'ragged' elsewhere (the Pallas kernel
      would run interpreted off-TPU).
    - 'fused': dropless sort-based dispatch + the fused Pallas expert-FFN
      kernel (ops/fused_ffn.py) — exact FastMoE dropless semantics, fastest
      single-chip; falls back to 'ragged' when expert dropout is active.
    - 'ragged' (default): dropless sort-based grouped GEMMs via lax.ragged_dot
      — exact FastMoE dropless semantics, no Pallas dependency.
    - 'capacity': static per-expert capacity buffers — required for expert
      parallelism (all_to_all needs fixed shapes) and capacity-factor sweeps.
    - 'capacity_fused': same capacity-dropping semantics (token-major
      priority, identical outputs to 'capacity') dispatched via the
      counting-sort layout + fused Pallas FFN — the fast single-chip form.
      Under a mesh with a >1 expert axis it switches to the shard_map EP
      form (ops/moe.py::moe_forward_fused_ep): the fused kernel runs per
      expert shard (GSPMD cannot partition a pallas_call), partials psum
      over the expert axis; capacity priority is per data shard (FastMoE's
      per-rank order).
    - 'capacity_fused_a2a': same as 'capacity_fused' single-chip; under an
      expert mesh, exchanges dispatched rows via all_to_all (FastMoE's
      global exchange) instead of psum-ing partials — each expert shard
      owns a 1/ep token chunk end-to-end (ops/moe.py::
      moe_forward_fused_ep_a2a).
    - 'expert_choice': experts pick their top-capacity tokens (Zhou et al.
      2022) — perfectly balanced, sort-free; NOT FastMoE parity.
    - 'dense': exact O(E) oracle (tests/parity only).
    """

    num_experts: int = 8
    top_k: int = 2
    hidden_features: int = 768
    drop: float = 0.0
    capacity_factor: float = 2.0
    eval_capacity_factor: float = 2.0
    dtype: typ.Any = jnp.float32
    parity_dense: bool = False
    dispatch_mode: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, d = x.shape
        E, h = self.num_experts, self.hidden_features
        init = trunc_normal_init(0.02)

        router_w = self.param("router_kernel", init, (d, E))
        router_b = self.param("router_bias", nn.initializers.zeros, (E,))
        # Expert-major params. The 'expert_' name prefix is the sharding key:
        # parallel.shard_params places any 'expert*' param on the expert mesh
        # axis (leading dim) and replicates the rest. Plain (unboxed) params
        # keep optimizers/checkpointing simple.
        w1 = self.param("expert_fc1_kernel", init, (E, d, h))
        b1 = self.param("expert_fc1_bias", nn.initializers.zeros, (E, h))
        w2 = self.param("expert_fc2_kernel", init, (E, h, d))
        b2 = self.param("expert_fc2_bias", nn.initializers.zeros, (E, d))

        flat = x.reshape(B * N, d)

        if self.parity_dense:
            y = moe_ops.moe_dense(
                flat, router_w, router_b, w1, b1, w2, b2, top_k=self.top_k
            )
            return y.reshape(B, N, d)

        dropout_rng = None
        if (not deterministic) and self.drop > 0.0:
            dropout_rng = self.make_rng("dropout")
        cf = self.eval_capacity_factor if deterministic else self.capacity_factor

        mode = self.dispatch_mode
        if mode == "auto":
            import jax

            mode = "fused" if jax.default_backend() == "tpu" else "ragged"
        if (mode in ("fused", "capacity_fused", "capacity_fused_a2a")
                and (dropout_rng is not None or h % 2 != 0)):
            # fused kernel: no dropout path; even hidden only
            mode = "ragged" if mode == "fused" else "capacity"

        if mode == "fused":
            y, aux = moe_ops.moe_forward_fused(
                flat, router_w, router_b, w1, b1, w2, b2, top_k=self.top_k,
            )
        elif mode in ("capacity_fused", "capacity_fused_a2a"):
            from ..parallel.sharding import mesh_axis_size

            if mesh_axis_size(EXPERT_AXIS) > 1:
                # expert-parallel forms: shard_map keeps the fused Pallas
                # kernel per expert shard (GSPMD cannot partition a
                # pallas_call). 'capacity_fused' combines partials with a
                # psum over the expert axis; 'capacity_fused_a2a' exchanges
                # dispatched rows with all_to_all (FastMoE's global
                # exchange) — less ICI from ep=8 up, chunked capacity
                # priority (see ops/moe.py docstrings for the trade)
                ep_fn = (moe_ops.moe_forward_fused_ep_a2a
                         if mode == "capacity_fused_a2a"
                         else moe_ops.moe_forward_fused_ep)
                y, aux = ep_fn(
                    flat, router_w, router_b, w1, b1, w2, b2,
                    top_k=self.top_k, capacity_factor=cf,
                )
            else:
                y, aux = moe_ops.moe_forward_fused(
                    flat, router_w, router_b, w1, b1, w2, b2,
                    top_k=self.top_k, capacity_factor=cf,
                )
        elif mode == "ragged":
            y, aux = moe_ops.moe_forward_ragged(
                flat, router_w, router_b, w1, b1, w2, b2,
                top_k=self.top_k,
                dropout_rng=dropout_rng, drop_rate=self.drop,
            )
        elif mode == "expert_choice":
            y, aux = moe_ops.moe_forward_expert_choice(
                flat, router_w, router_b, w1, b1, w2, b2,
                capacity_factor=cf,
                dropout_rng=dropout_rng, drop_rate=self.drop,
                shard_buf=lambda b: constrain(b, (EXPERT_AXIS, None, None)),
            )
        else:
            y, aux = moe_ops.moe_forward(
                flat, router_w, router_b, w1, b1, w2, b2,
                top_k=self.top_k, capacity_factor=cf,
                dropout_rng=dropout_rng, drop_rate=self.drop,
                shard_buf=lambda b: constrain(b, (EXPERT_AXIS, None, None)),
            )
        for k, v in aux.items():
            self.sow(METRICS_COLLECTION, k, v,
                     reduce_fn=lambda a, b: b, init_fn=lambda: jnp.asarray(0.0))
        return y.reshape(B, N, d)
