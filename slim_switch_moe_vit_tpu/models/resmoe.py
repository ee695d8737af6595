"""ResMoE: gated residual blocks with MoE MLPs + model registrations.

Rebuild of ``models/resMoE.py:88-209``. The block wiring is the reference's
``forward_residule_moe`` (``resMoE.py:126-145``):

    x = norm1(x); m = dense_gate(x)
    skip, tk = x*m[...,0], x*m[...,1]
    x = drop_path(attn(tk)) + tk + skip
    x = norm2(x); m = moe_gate(x)
    skip, tk = x*m[...,0], x*m[...,1]
    x = drop_path(moe_mlp(tk)) + tk + skip

Note the reference's semantics: skipped tokens are ZERO-MASKED, not gathered —
attention and the MoE still run over the full (masked) sequence. That is the
parity mode here (and it is jit-friendly: static shapes). ``compact_tokens``
mode (round-2 fast path) gathers kept tokens before attention instead.

Registered models (names match the reference registry):
- ``resmoe_tiny_patch16_224_expert8``  (gates + 8-expert top-2 MoE in every block,
  reference ``resMoE.py:151-187``)
- ``moe_tiny_patch16_224_expert8``     (MoE MLP only, ``resMoE.py:190-209``)
plus small/base scale-ups of the same recipes.
"""
from __future__ import annotations

import typing as typ

import jax.numpy as jnp
from flax import linen as nn

from .gates import TokenGate
from .layers import LayerNorm, DropPath
from .moe import MoEMlp
from .registry import register_model
from .vit import Attention, VisionTransformer

Dtype = typ.Any


class ResMoEBlock(nn.Module):
    """Gated attention + gated MoE-MLP block (reference resMoE.py:126-145)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    attn_impl: str = "auto"
    ln_impl: str = "auto"
    # MoE config
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 2.0
    eval_capacity_factor: float = 2.0
    parity_dense: bool = False
    dispatch_mode: str = "auto"
    # Gate config
    starting_threshold: float = 1.0
    target_threshold: float = 0.9
    # Token-skip execution mode:
    # - 'parity': reference semantics — skipped tokens are zero-masked but
    #   attention/MoE still run over the full sequence (resMoE.py:132-143).
    # - 'compact': TPU fast mode — the top ceil(N * token_capacity) tokens by
    #   gate keep-score are gathered, the sub-block runs on the short
    #   sequence, results scatter back. Saves real FLOPs (static shapes).
    mode: str = "parity"
    token_capacity: float = 1.0

    def setup(self):
        self.norm1 = LayerNorm(name="norm1", impl=self.ln_impl)
        self.attn = Attention(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            dtype=self.dtype, use_flash=self.use_flash,
            attn_impl=self.attn_impl, name="attn",
        )
        self.norm2 = LayerNorm(name="norm2", impl=self.ln_impl)
        self.mlp = MoEMlp(
            num_experts=self.num_experts, top_k=self.top_k,
            hidden_features=int(self.dim * self.mlp_ratio), drop=self.drop,
            capacity_factor=self.capacity_factor,
            eval_capacity_factor=self.eval_capacity_factor,
            dtype=self.dtype, parity_dense=self.parity_dense,
            dispatch_mode=self.dispatch_mode, name="mlp",
        )
        self.dense_gate = TokenGate(
            starting_threshold=self.starting_threshold,
            target_threshold=self.target_threshold, name="dense_gate",
        )
        self.moe_gate = TokenGate(
            starting_threshold=self.starting_threshold,
            target_threshold=self.target_threshold, name="moe_gate",
        )
        self.drop_path_mod = DropPath(self.drop_path, name="drop_path")

    def _compact_apply(self, fn, x, keep_w, deterministic):
        """Gather the top-C tokens by keep weight, run ``fn`` on the short
        sequence, scatter back; non-selected tokens contribute zero (they ride
        the residual, same as a zero gate weight in parity mode)."""
        import numpy as np

        B, N, d = x.shape
        C = int(np.ceil(N * self.token_capacity))
        C = min(((C + 7) // 8) * 8, N)  # sublane-friendly
        order = jnp.argsort(-keep_w[..., 0], axis=-1, stable=True)  # kept first
        sel = order[:, :C]
        batch_idx = jnp.arange(B)[:, None]
        short = jnp.take_along_axis(x, sel[..., None], axis=1)
        out_short = fn(short)
        out = jnp.zeros_like(x).at[batch_idx, sel].set(
            out_short.astype(x.dtype))
        # gate weight still multiplies (STE gradient path), and tokens beyond
        # capacity are zeroed even if their gate said keep
        in_sel = jnp.zeros((B, N), bool).at[batch_idx, sel].set(True)
        return out * keep_w.astype(x.dtype) * in_sel[..., None].astype(x.dtype)

    def _gated_sub_block(self, xn, gate, fn, deterministic):
        """Gate ``xn``, run ``fn`` on the kept tokens, return
        (branch = drop_path(fn(tk)), passthrough = tk + skip). The block
        output is their sum (reference resMoE.py:132-143)."""
        mask = gate(xn, deterministic=deterministic)
        skip = xn * mask[..., 0:1].astype(xn.dtype)
        tk = xn * mask[..., 1:2].astype(xn.dtype)
        if self.mode == "compact":
            y = self._compact_apply(fn, xn, mask[..., 1:2], deterministic)
        else:
            y = fn(tk)
        return self.drop_path_mod(y, deterministic=deterministic), tk + skip

    def __call__(self, x, deterministic: bool = True):
        y, s = self.deferred_call(x, None, deterministic=deterministic)
        return y + s

    def deferred_call(self, u, pending, deterministic: bool = True):
        """Residual-deferred form: the previous branch (``pending``) is added
        inside norm1's fused pass. The raw sums are never read again — the
        reference norms straight through the residual (resMoE.py:127,136) —
        so both norms use the slim (no-sum) kernel. Returns the MoE branch
        and its passthrough un-added."""
        if pending is None:
            xn = self.norm1(u)
        else:
            xn = self.norm1(u, residual=pending, emit_sum=False)
        y, s = self._gated_sub_block(
            xn, self.dense_gate,
            lambda t: self.attn(t, deterministic=deterministic),
            deterministic)
        xn2 = self.norm2(y, residual=s, emit_sum=False)
        return self._gated_sub_block(
            xn2, self.moe_gate,
            lambda t: self.mlp(t, deterministic=deterministic),
            deterministic)


def _moe_kwargs(kwargs):
    """Extract MoE/gate CLI kwargs (main.py:519-530 passes thresholds)."""
    return dict(
        starting_threshold=kwargs.pop("starting_threshold", 1.0),
        target_threshold=kwargs.pop("target_threshold", 0.9),
        num_experts=kwargs.pop("num_experts", 8),
        top_k=kwargs.pop("moe_top_k", 2),
        capacity_factor=kwargs.pop("capacity_factor", 2.0),
        eval_capacity_factor=kwargs.pop("eval_capacity_factor", 2.0),
        parity_dense=kwargs.pop("parity_dense", False),
        dispatch_mode=kwargs.pop("dispatch_mode", "auto"),
        mode=kwargs.pop("resmoe_mode", "parity"),
        token_capacity=kwargs.pop("token_capacity", 1.0),
    )


def _resmoe_vit(embed_dim, num_heads, moe, **kwargs):
    from .zoo import _common_kwargs

    def block_factory(idx, **bk):
        return ResMoEBlock(
            num_experts=moe["num_experts"], top_k=moe["top_k"],
            capacity_factor=moe["capacity_factor"],
            eval_capacity_factor=moe["eval_capacity_factor"],
            parity_dense=moe["parity_dense"],
            dispatch_mode=moe["dispatch_mode"],
            mode=moe["mode"], token_capacity=moe["token_capacity"],
            starting_threshold=moe["starting_threshold"],
            target_threshold=moe["target_threshold"], **bk,
        )

    return VisionTransformer(
        patch_size=16, embed_dim=embed_dim, depth=12, num_heads=num_heads,
        mlp_ratio=4.0, qkv_bias=True, block_factory=block_factory,
        **_common_kwargs(kwargs),
    )


def _moe_vit(embed_dim, num_heads, moe, **kwargs):
    from .zoo import _common_kwargs

    def mlp_factory(idx, dim, ratio, drop, dtype):
        return MoEMlp(
            num_experts=moe["num_experts"], top_k=moe["top_k"],
            hidden_features=int(dim * ratio), drop=drop,
            capacity_factor=moe["capacity_factor"],
            eval_capacity_factor=moe["eval_capacity_factor"],
            dtype=dtype, parity_dense=moe["parity_dense"],
            dispatch_mode=moe["dispatch_mode"], name="mlp",
        )

    return VisionTransformer(
        patch_size=16, embed_dim=embed_dim, depth=12, num_heads=num_heads,
        mlp_ratio=4.0, qkv_bias=True, block_mlp_factory=mlp_factory,
        **_common_kwargs(kwargs),
    )


@register_model
def resmoe_tiny_patch16_224_expert8(pretrained=False, **kwargs):
    """Gates + 8-expert top-2 MoE in all 12 blocks (reference resMoE.py:151-187)."""
    return _resmoe_vit(192, 3, _moe_kwargs(kwargs), **kwargs)


@register_model
def resmoe_small_patch16_224_expert8(pretrained=False, **kwargs):
    return _resmoe_vit(384, 6, _moe_kwargs(kwargs), **kwargs)


@register_model
def resmoe_base_patch16_224_expert8(pretrained=False, **kwargs):
    return _resmoe_vit(768, 12, _moe_kwargs(kwargs), **kwargs)


@register_model
def moe_tiny_patch16_224_expert8(pretrained=False, **kwargs):
    """MoE MLP only, no gates (reference resMoE.py:190-209)."""
    return _moe_vit(192, 3, _moe_kwargs(kwargs), **kwargs)


@register_model
def moe_small_patch16_224_expert8(pretrained=False, **kwargs):
    return _moe_vit(384, 6, _moe_kwargs(kwargs), **kwargs)


@register_model
def moe_base_patch16_224_expert32(pretrained=False, **kwargs):
    """Expert-parallel scale config (BASELINE.json config 5: ViT-B/16, 32 experts)."""
    kwargs.setdefault("num_experts", 32)
    return _moe_vit(768, 12, _moe_kwargs(kwargs), **kwargs)
