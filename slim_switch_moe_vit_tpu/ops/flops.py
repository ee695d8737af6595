"""Analytic + compiler-backed FLOP accounting.

Rebuild of the reference's FLOP pricing (``models/resmoe_flop_hook.py``,
``models/layers.py:362-383,466-468``): analytic formulas priced by *active*
token counts (post-gate), so capacity-factor / token-skip sweeps can report
effective compute. Two tiers:

- ``resmoe_block_flops`` / ``vit_flops``: closed-form formulas (matching the
  hook's pricing: attention ``4·n·d² + 2·n²·d`` at resmoe_flop_hook.py:34,
  gate/router linears, norms/residuals);
- ``xla_cost_analysis``: the TPU-native equivalent of a profiler hook — asks
  XLA for the compiled computation's exact FLOPs/bytes.
"""
from __future__ import annotations

import typing as typ


def gate_flops(tokens: float, dim: int) -> float:
    """Token-skip gate head: (T, d) @ (d, 1) (resmoe_flop_hook.py:13-17)."""
    return tokens * dim * 1


def router_flops(tokens: float, dim: int, num_experts: int) -> float:
    """MoE gate linear + softmax (resmoe_flop_hook.py:4-10)."""
    return tokens * dim * num_experts + tokens * (3 * num_experts - 1)


def attention_flops(active_tokens: float, dim: int) -> float:
    """4·n·d² (qkv+proj) + 2·n²·d (scores+mix) (resmoe_flop_hook.py:34)."""
    return 4 * active_tokens * dim * dim + 2 * active_tokens ** 2 * dim


def expert_ffn_flops(active_tokens: float, dim: int, hidden: int,
                     top_k: int = 1) -> float:
    """Per-token expert FFN cost: each routed copy does 2·d·h MACs -> 2 GEMMs."""
    return 2 * active_tokens * top_k * dim * hidden * 2 / 2  # = 2*T*k*d*h


def norm_flops(total_scalars: float, affine: bool = True) -> float:
    """reference prices a norm at 1 (or 2 with affine) flop/scalar
    (resmoe_flop_hook.py:25-27)."""
    return total_scalars * (2 if affine else 1)


def resmoe_block_flops(batch: int, tokens: int, dim: int, hidden: int,
                       num_experts: int, top_k: int,
                       attn_keep_frac: float = 1.0,
                       moe_keep_frac: float = 1.0) -> float:
    """One ResMoE block priced at *active* token counts (the reference hook
    recomputes gate masks to count kept tokens, resmoe_flop_hook.py:20-62)."""
    total = batch * tokens
    n_attn = total * attn_keep_frac
    n_moe = total * moe_keep_frac
    scalars = total * dim
    f = 0.0
    f += norm_flops(scalars)                      # norm1
    f += gate_flops(total, dim)                   # dense gate
    f += attention_flops(n_attn / batch, dim) * batch
    f += scalars                                  # attn residual
    f += norm_flops(scalars)                      # norm2
    f += gate_flops(total, dim)                   # moe gate
    f += router_flops(n_moe, dim, num_experts)    # expert router
    f += 4 * n_moe * top_k * dim * hidden         # two grouped GEMMs, 2 MAC=2flop
    f += scalars                                  # moe residual
    return f


def vit_flops(batch: int, img_size: int, patch_size: int, dim: int, depth: int,
              hidden_mult: float = 4.0, num_classes: int = 1000,
              num_tokens: int = 1, moe: bool = False, num_experts: int = 8,
              top_k: int = 2) -> float:
    """Forward FLOPs of a (Res)MoE / dense ViT."""
    grid = img_size // patch_size
    n = grid * grid + num_tokens
    hidden = int(dim * hidden_mult)
    f = 2.0 * batch * (grid * grid) * (patch_size * patch_size * 3) * dim
    for _ in range(depth):
        if moe:
            f += resmoe_block_flops(batch, n, dim, hidden, num_experts, top_k)
        else:
            f += batch * (attention_flops(n, dim) + 4 * n * dim * hidden
                          + 2 * norm_flops(n * dim) + 2 * n * dim)
    f += 2.0 * batch * dim * num_classes
    return f


def xla_cost_analysis(jitted_fn, *args) -> typ.Dict[str, float]:
    """Exact compiled-cost query (TPU equivalent of the reference's forward
    hook): returns XLA's flops/bytes accessed for the lowered computation."""
    compiled = jitted_fn.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {k: float(v) for k, v in ca.items()
            if isinstance(v, (int, float))}
