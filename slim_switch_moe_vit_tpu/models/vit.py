"""Vision Transformer backbone (DeiT family), TPU-native.

Functional flax.linen re-design of the reference's timm-derived ViT
(``models/vision_transformer.py:248-322,642-848``) and the distilled DeiT
variant (``models/model.py:32-77``):

- ``Attention``: fused QKV GEMM + scaled-dot-product. The softmax path runs in
  fp32; matmuls carry ``preferred_element_type`` so the MXU accumulates at full
  precision even with bf16 activations. A Pallas flash-attention kernel is used
  for long sequences (see ``ops/attention.py``); for ViT's 197-token sequences
  the plain XLA path is already compute-bound on the MXU.
- ``Block``: pre-LN attn + MLP with residuals and stochastic depth
  (reference ``Block.forward``, ``models/vision_transformer.py:319-322``).
- ``VisionTransformer``: patch embed, cls (+dist) token, learned pos embed,
  stochastic-depth linspace over depth (reference ``:720-722``), final norm +
  head. Distilled model returns (head, head_dist) in training and their average
  at eval (reference ``models/model.py:69-77``).

The MLP of every block is pluggable (``mlp_factory``) — that is how the MoE and
token-skip variants graft in without touching this file (the reference instead
monkey-patches ``Block.forward`` at registration time, ``models/resMoE.py:163-187``).
"""
from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dense, DropPath, LayerNorm, Mlp, PatchEmbed, trunc_normal_init

Dtype = typ.Any


class Attention(nn.Module):
    """Multi-head self-attention (reference: ``models/vision_transformer.py:248-280``)."""

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    # 'auto': fused Pallas MHA kernel on TPU (packed-qkv, fused backward, no
    # layout transposes — see ops/attention.py), XLA einsum elsewhere.
    # 'xla' / 'fused' force a path (fused runs interpreted off-TPU: tests).
    attn_impl: str = "auto"

    def _fused_ok(self, N: int, deterministic: bool) -> bool:
        if self.attn_impl == "xla" or self.use_flash:
            return False
        if self.attn_drop > 0.0 and not deterministic:
            return False  # fused kernel has no attention-dropout path
        if N > 1024:
            return False
        if self.attn_impl == "fused":
            return True
        return jax.default_backend() == "tpu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        d = C // H
        scale = d ** -0.5

        qkv = Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)

        # NOTE r3: a proj-folded inference kernel (ops/attention.py::
        # fused_mha_proj + the _ProjParams stand-in) was integrated here and
        # MEASURED SLOWER at deit-tiny b256 eval: the attn kernel grew 3.18
        # -> 4.11 ms (per-head (nb,64)@(64,C) proj dots half-fill the MXU and
        # serialize) while the removed XLA proj fusion only gave back 0.44,
        # and the LN-operand layout copy it aimed at persisted (the seam is
        # not proj->LN). Kept as a tested op for shapes where folding wins.
        if self._fused_ok(N, deterministic):
            from ..ops.attention import fused_mha

            out = fused_mha(qkv, H, scale,
                            jax.default_backend() != "tpu")  # (B, N, C)
        else:
            # contiguous last-axis split (a middle-axis reshape+index here
            # costs ~2.6ms/step of pure layout copies at ViT-tiny/b128)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, N, H, d)
            k = k.reshape(B, N, H, d)
            v = v.reshape(B, N, H, d)

            if self.use_flash and deterministic:
                from ..ops.attention import flash_attention

                out = flash_attention(q, k, v, scale=scale)  # (B, N, H, d)
            else:
                attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                  preferred_element_type=jnp.float32) * scale
                attn = jax.nn.softmax(attn, axis=-1)
                attn = nn.Dropout(self.attn_drop)(attn,
                                                  deterministic=deterministic)
                out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v,
                                 preferred_element_type=jnp.float32)
            out = out.reshape(B, N, C)

        out = out.astype(self.dtype)
        out = Dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


def default_mlp_factory(dim: int, mlp_ratio: float, drop: float, dtype) -> nn.Module:
    return Mlp(hidden_features=int(dim * mlp_ratio), drop=drop, dtype=dtype, name="mlp")


class Block(nn.Module):
    """Pre-LN transformer block (reference: ``models/vision_transformer.py:283-322``)."""

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
    mlp_factory: typ.Callable = default_mlp_factory

    def setup(self):
        self.norm1 = LayerNorm(name="norm1", impl=self.ln_impl)
        self.attn = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            use_flash=self.use_flash,
            attn_impl=self.attn_impl,
            name="attn",
        )
        self.norm2 = LayerNorm(name="norm2", impl=self.ln_impl)
        self.mlp = self.mlp_factory(self.dim, self.mlp_ratio, self.drop, self.dtype)
        self.drop_path_mod = DropPath(self.drop_path, name="drop_path")

    def __call__(self, x, deterministic: bool = True):
        y = self.attn(self.norm1(x), deterministic=deterministic)
        x = x + self.drop_path_mod(y, deterministic=deterministic)
        y = self.mlp(self.norm2(x), deterministic=deterministic)
        x = x + self.drop_path_mod(y, deterministic=deterministic)
        return x

    def deferred_call(self, u, pending, deterministic: bool = True):
        """Residual-deferred block step: the previous branch output
        (``pending``) has NOT been added to the stream ``u`` yet — the add
        rides the next LayerNorm as a single fused pass (ops/fused_ln.py).
        Returns (new_stream, new_pending). Same math as ``__call__``:
        LN(u+pending) sees exactly the summed stream.
        """
        if pending is None:
            u1, y1 = u, self.norm1(u)
        else:
            u1, y1 = self.norm1(u, residual=pending)
        a = self.attn(y1, deterministic=deterministic)
        a = self.drop_path_mod(a, deterministic=deterministic)
        u2, y2 = self.norm2(u1, residual=a)
        m = self.mlp(y2, deterministic=deterministic)
        return u2, self.drop_path_mod(m, deterministic=deterministic)


class VisionTransformer(nn.Module):
    """ViT for classification (reference: ``models/vision_transformer.py:642-848``).

    ``distilled=True`` adds the DeiT distillation token + second head
    (reference: ``models/model.py:32-77``).
    """

    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    # Pre-logits (representation) layer: Dense(embed_dim -> size) + tanh on
    # the class token before the head (reference:
    # ``models/vision_transformer.py:744-755,833``). Only the in21k
    # large-p32 / huge checkpoints carry it; ignored when ``distilled``.
    representation_size: typ.Optional[int] = None
    distilled: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    attn_impl: str = "auto"
    ln_impl: str = "auto"
    # Factory: (layer_idx, dim, mlp_ratio, drop, dtype) -> nn.Module, or None for dense.
    block_mlp_factory: typ.Optional[typ.Callable] = None
    # Full block replacement: (layer_idx, **block_kwargs) -> nn.Module. Used by the
    # ResMoE variant (gates around attn+MoE, reference models/resMoE.py:126-145).
    block_factory: typ.Optional[typ.Callable] = None

    @property
    def num_tokens(self) -> int:
        return 2 if self.distilled else 1

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def setup(self):
        self.patch_embed = PatchEmbed(
            img_size=self.img_size,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )
        self.cls_token = self.param(
            "cls_token", trunc_normal_init(0.02), (1, 1, self.embed_dim)
        )
        if self.distilled:
            self.dist_token = self.param(
                "dist_token", trunc_normal_init(0.02), (1, 1, self.embed_dim)
            )
        self.pos_embed = self.param(
            "pos_embed",
            trunc_normal_init(0.02),
            (1, self.num_patches + self.num_tokens, self.embed_dim),
        )
        self.pos_drop = nn.Dropout(self.drop_rate)

        # Stochastic-depth decay rule (reference: vision_transformer.py:720-722).
        # numpy, not jnp: setup() runs under jit tracing where jnp values are
        # tracers and these must be static python floats.
        import numpy as np

        dpr = [float(r) for r in np.linspace(0.0, self.drop_path_rate, self.depth)]
        blocks = []
        for i in range(self.depth):
            block_kwargs = dict(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=dpr[i],
                dtype=self.dtype,
                use_flash=self.use_flash,
                attn_impl=self.attn_impl,
                ln_impl=self.ln_impl,
                name=f"blocks_{i}",
            )
            if self.block_factory is not None:
                blocks.append(self.block_factory(i, **block_kwargs))
                continue
            factory = default_mlp_factory
            if self.block_mlp_factory is not None:
                bf = self.block_mlp_factory
                factory = (lambda idx: lambda dim, ratio, drop, dtype: bf(
                    idx, dim, ratio, drop, dtype))(i)
            blocks.append(Block(mlp_factory=factory, **block_kwargs))
        self.blocks = blocks
        self.norm = LayerNorm(name="norm", impl=self.ln_impl)
        if self.representation_size and not self.distilled:
            self.pre_logits = Dense(
                self.representation_size, dtype=jnp.float32, name="pre_logits"
            )
        if self.num_classes > 0:
            self.head = Dense(self.num_classes, dtype=jnp.float32, name="head")
            if self.distilled:
                self.head_dist = Dense(
                    self.num_classes, dtype=jnp.float32, name="head_dist"
                )

    def forward_features(self, x, deterministic: bool = True):
        B = x.shape[0]
        x = self.patch_embed(x)
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype), (B, 1, self.embed_dim))
        if self.distilled:
            dist = jnp.broadcast_to(
                self.dist_token.astype(x.dtype), (B, 1, self.embed_dim)
            )
            x = jnp.concatenate([cls, dist, x], axis=1)
        else:
            x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        x = self.pos_drop(x, deterministic=deterministic)
        # Residual-deferred chain: each deferred-capable block leaves its
        # final branch un-added (``pending``); the next block's norm1 (or the
        # final norm) folds the add into its fused LN pass. Blocks without a
        # ``deferred_call`` take the conventional path.
        pending = None
        for blk in self.blocks:
            if hasattr(blk, "deferred_call"):
                x, pending = blk.deferred_call(x, pending,
                                               deterministic=deterministic)
            else:
                if pending is not None:
                    x = x + pending
                    pending = None
                x = blk(x, deterministic=deterministic)
        if pending is not None:
            # the raw sum is never read again -> slim (no-sum) kernel
            return self.norm(x, residual=pending, emit_sum=False)
        x = self.norm(x)
        return x

    def __call__(self, x, deterministic: bool = True, train: typ.Optional[bool] = None):
        if train is not None:
            deterministic = not train
        x = self.forward_features(x, deterministic=deterministic)
        if self.distilled:
            if self.num_classes == 0:
                return x[:, 0]
            logits = self.head(x[:, 0].astype(jnp.float32))
            logits_dist = self.head_dist(x[:, 1].astype(jnp.float32))
            if not deterministic:
                # Training: both heads separately (fed to DistillationLoss).
                return logits, logits_dist
            # Eval: average of both classifiers (reference: models/model.py:76-77).
            return (logits + logits_dist) / 2.0
        feat = x[:, 0].astype(jnp.float32)
        if self.representation_size:
            feat = jnp.tanh(self.pre_logits(feat))
        if self.num_classes == 0:
            return feat
        return self.head(feat)


def resize_pos_embed(pos_embed, num_extra_tokens: int, new_grid: int):
    """Bicubic pos-embed interpolation for finetuning at a new resolution
    (reference: ``main.py:550-571``, ``models/vision_transformer.py:1008-1027``)."""
    import math

    extra = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:]
    orig = int(math.sqrt(grid.shape[1]))
    D = grid.shape[-1]
    grid = grid.reshape(1, orig, orig, D)
    grid = jax.image.resize(grid, (1, new_grid, new_grid, D), method="bicubic")
    grid = grid.reshape(1, new_grid * new_grid, D)
    return jnp.concatenate([extra, grid], axis=1)
