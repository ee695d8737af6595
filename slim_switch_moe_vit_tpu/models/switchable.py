"""Switchable ViT: bucketed router norm + mid-network token truncation.

Rebuild of ``SwitchableLayerNorm`` (reference ``models/layers.py:31-157``) and
``SwitchableVisionTransformer`` (reference ``models/vision_transformer.py:325-639``).

``SwitchableLayerNorm``: LayerNorm whose affine params come in
``switchable_buckets`` variants; each token picks a bucket — explicitly, or by
L2 distance to non-trainable centroids (reference ``:134-140``). The reference
applies the per-bucket affine with boolean-mask writes in a python loop
(``:144-149``); here it is a single gather over the bucket dim — same math,
static shapes.

``SwitchableVisionTransformer``: blocks split into pre/mid/post groups around
the router (reference ``:422-472``; with the reference's defaults
router_start=0, router_end=-1 the split is 0/11/1). In routing mode, tokens
whose bucket passes the threshold are compacted to the front and the sequence
is TRUNCATED before the mid blocks; after, tokens are scattered back and
skipped positions take the pre-router activations (reference ``:593-613``).

jit note: the reference truncates to the *dynamic* max passthru length
(``:596``); XLA needs static shapes, so truncation length is the static
``route_capacity`` (defaults to full length). Passthru tokens beyond capacity
are treated as skipped (take pre-router activations). The reference's routing
indexing is acknowledged buggy research code (SURVEY §2.23); this implements
the intended semantics.
"""
from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dense, trunc_normal_init
from .vit import Block

Dtype = typ.Any

CENTROID_COLLECTION = "centroids"


class SwitchableLayerNorm(nn.Module):
    features: int
    eps: float = 1e-5
    elementwise_affine: bool = True
    switchable_buckets: int = 1

    @nn.compact
    def __call__(self, x, buckets: typ.Optional[jnp.ndarray] = None):
        """x: (..., d). buckets: int, (...)-shaped int array, or None to
        select by centroid distance. Returns (y, selected_buckets)."""
        B = self.switchable_buckets
        d = self.features
        centroids = self.variable(
            CENTROID_COLLECTION, "centroids",
            lambda: jnp.zeros((B, d), jnp.float32),
        )

        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        diff = x32 - mean
        var = jnp.mean(diff * diff, axis=-1, keepdims=True)
        normalized = diff * jax.lax.rsqrt(var + self.eps)

        if buckets is None:
            # L2 distance of each token to each centroid (reference :134-140)
            dists = (
                jnp.sum(x32 * x32, axis=-1, keepdims=True)
                - 2.0 * jnp.einsum("...d,bd->...b", x32, centroids.value)
                + jnp.sum(centroids.value * centroids.value, axis=-1)
            )
            selected = jnp.argmin(dists, axis=-1)  # (...)
        else:
            selected = jnp.broadcast_to(jnp.asarray(buckets, jnp.int32),
                                        x.shape[:-1])

        if self.elementwise_affine:
            weights = self.param("weights", nn.initializers.ones, (B, d))
            biases = self.param("biases", nn.initializers.zeros, (B, d))
            w = weights[selected]  # (..., d) gather over bucket dim
            b = biases[selected]
            normalized = normalized * w + b
        return normalized.astype(x.dtype), selected

    @staticmethod
    def set_centroids(variables: dict, path: typ.Sequence[str],
                      centroids: jnp.ndarray) -> dict:
        """Functional centroid update (reference set_centroids, layers.py:96-101)."""
        col = variables[CENTROID_COLLECTION]

        def rec(tree, p):
            out = dict(tree)
            if len(p) == 0:
                assert out["centroids"].shape == centroids.shape, \
                    "Passed centroids must match (buckets, features)!"
                out["centroids"] = centroids
                return out
            out[p[0]] = rec(tree[p[0]], p[1:])
            return out

        return {**variables, CENTROID_COLLECTION: rec(col, list(path))}


class SwitchableVisionTransformer(nn.Module):
    """reference vision_transformer.py:325-639."""

    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    distilled: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32
    buckets: int = 1
    router_start: int = 0
    router_end: int = -1
    route_capacity: typ.Optional[int] = None
    collect_embeddings: bool = False

    @property
    def num_tokens(self):
        return 2 if self.distilled else 1

    @property
    def num_patches(self):
        return (self.img_size // self.patch_size) ** 2

    def setup(self):
        import numpy as np

        from .layers import LayerNorm, PatchEmbed

        self.patch_embed = PatchEmbed(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, dtype=self.dtype, name="patch_embed")
        self.cls_token = self.param("cls_token", trunc_normal_init(0.02),
                                    (1, 1, self.embed_dim))
        if self.distilled:
            self.dist_token = self.param("dist_token", trunc_normal_init(0.02),
                                         (1, 1, self.embed_dim))
        self.pos_embed = self.param(
            "pos_embed", trunc_normal_init(0.02),
            (1, self.num_patches + self.num_tokens, self.embed_dim))
        self.pos_drop = nn.Dropout(self.drop_rate)
        self.router = SwitchableLayerNorm(
            features=self.embed_dim, switchable_buckets=self.buckets,
            name="router")

        # block split (reference :422-472): pre = start%depth,
        # mid = (end-start)%depth, post = (depth - end%depth)%depth
        n_pre = self.router_start % self.depth
        n_mid = (self.router_end - self.router_start) % self.depth
        n_post = (self.depth - self.router_end % self.depth) % self.depth
        dpr = [float(r) for r in
               np.linspace(0.0, self.drop_path_rate, self.depth)]

        def mk(i):
            return Block(dim=self.embed_dim, num_heads=self.num_heads,
                         mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                         drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                         drop_path=dpr[i], dtype=self.dtype,
                         name=f"block_{i}")

        idx = iter(range(self.depth))
        self.pre_blocks = [mk(next(idx)) for _ in range(n_pre)]
        self.mid_blocks = [mk(next(idx)) for _ in range(n_mid)]
        self.post_blocks = [mk(next(idx)) for _ in range(n_post)]
        self.norm = LayerNorm(name="norm")
        if self.num_classes > 0:
            self.head = Dense(self.num_classes, dtype=jnp.float32, name="head")
            if self.distilled:
                self.head_dist = Dense(self.num_classes, dtype=jnp.float32,
                                       name="head_dist")

    def forward_pre(self, x, deterministic):
        B = x.shape[0]
        x = self.patch_embed(x)
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype),
                               (B, 1, self.embed_dim))
        if self.distilled:
            dist = jnp.broadcast_to(self.dist_token.astype(x.dtype),
                                    (B, 1, self.embed_dim))
            x = jnp.concatenate([cls, dist, x], axis=1)
        else:
            x = jnp.concatenate([cls, x], axis=1)
        x = self.pos_drop(x + self.pos_embed.astype(x.dtype),
                          deterministic=deterministic)
        return x

    def __call__(self, x, bucket=None, threshold: int = 0,
                 routing: bool = False, deterministic: bool = True):
        x = self.forward_pre(x, deterministic)
        for blk in self.pre_blocks:
            x = blk(x, deterministic=deterministic)

        pre_x = x if (self.collect_embeddings or routing) else None

        x, buckets = self.router(x, bucket)  # buckets: (B, N)

        if routing:
            B, N, D = x.shape
            C = self.route_capacity or N
            passthru = buckets >= threshold  # (B, N)
            # compact passthru tokens to the front (stable order), truncate to C
            order = jnp.argsort(jnp.where(passthru, 0, 1), axis=-1,
                                stable=True)  # passthru indices first
            sel = order[:, :C]  # (B, C)
            batch_idx = jnp.arange(B)[:, None]
            shortened = x[batch_idx, sel]
            for blk in self.mid_blocks:
                shortened = blk(shortened, deterministic=deterministic)
            # scatter back; skipped tokens take pre-router activations
            full = jnp.asarray(pre_x)
            full = full.at[batch_idx, sel].set(shortened.astype(full.dtype))
            # positions beyond capacity or not passthru stay as pre_x
            keep = jnp.zeros((B, N), bool).at[batch_idx, sel].set(True)
            keep = keep & passthru
            x = jnp.where(keep[..., None], full, pre_x)
            for blk in self.post_blocks:
                x = blk(x, deterministic=deterministic)
        else:
            for blk in self.mid_blocks:
                x = blk(x, deterministic=deterministic)
            for blk in self.post_blocks:
                x = blk(x, deterministic=deterministic)

        x = self.norm(x)
        if self.num_classes == 0:
            return x[:, 0]
        if self.distilled:
            logits = self.head(x[:, 0].astype(jnp.float32))
            logits_dist = self.head_dist(x[:, 1].astype(jnp.float32))
            if not deterministic:
                out = (logits, logits_dist)
            else:
                out = (logits + logits_dist) / 2.0
        else:
            out = self.head(x[:, 0].astype(jnp.float32))
        if self.collect_embeddings:
            return out, pre_x
        return out


from .registry import register_model  # noqa: E402


@register_model
def deit_sw_tiny_patch16_224(pretrained=False, **kwargs):
    """reference models/model.py:103-122."""
    from .zoo import _common_kwargs

    extra = {}
    for k in ("buckets", "router_start", "router_end", "route_capacity",
              "collect_embeddings"):
        if k in kwargs:
            extra[k] = kwargs[k]
    return SwitchableVisionTransformer(
        patch_size=16, embed_dim=192, depth=12, num_heads=3, mlp_ratio=4.0,
        qkv_bias=True, **extra, **_common_kwargs(kwargs))
