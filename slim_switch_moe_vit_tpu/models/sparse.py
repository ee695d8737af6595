"""Structured pruning: zeta-masked attention/MLP + network-wide search control.

Rebuild of ``SparseAttention``/``SparseMlp`` (reference ``models/layers.py:
275-473``) and the ``BaseModel`` pruning controller (reference
``models/base_model.py``):

- learnable ``zeta`` masks over attention heads/channels (head_search /
  uniform_search / full), a tanh-activated per-patch mask, and a zeta over MLP
  hidden units;
- ``compress`` binarizes zetas at a percentile threshold derived from a
  budget; ``decompress`` restores the soft masks; the per-patch mask is
  OR-propagated backward from the last block to the first
  (reference ``base_model.py:102-118``);
- L1 sparsity loss and remaining-fraction / params / FLOP accounting.

State layout: soft zetas are params (trainable); the binarized
``searched_*`` masks and the ``is_searched`` switch live in the ``pruning``
variable collection, toggled functionally by the controller — the torch
version mutates module attributes (``layers.py:333-347``).
"""
from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Dense, DropPath, LayerNorm
from .registry import register_model

PRUNING_COLLECTION = "pruning"


class SparseAttention(nn.Module):
    """reference layers.py:275-388."""

    num_heads: int
    num_patches: int = 197
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    head_search: bool = False
    uniform_search: bool = False
    dtype: typ.Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, Cdim = x.shape
        H = self.num_heads
        d = Cdim // H
        scale = d ** -0.5
        if self.head_search:
            zshape = (1, 1, H, 1, 1)
        elif self.uniform_search:
            zshape = (1, 1, 1, 1, d)
        else:
            zshape = (1, 1, H, 1, d)
        zeta = self.param("zeta", nn.initializers.ones, zshape)
        patch_zeta = self.param(
            "patch_zeta", lambda k, s: jnp.ones(s, jnp.float32) * 3.0,
            (1, self.num_patches, 1))
        is_searched = self.variable(PRUNING_COLLECTION, "is_searched",
                                    lambda: jnp.asarray(0.0, jnp.float32))
        searched_zeta = self.variable(PRUNING_COLLECTION, "searched_zeta",
                                      lambda: jnp.ones(zshape, jnp.float32))
        searched_patch = self.variable(
            PRUNING_COLLECTION, "searched_patch_zeta",
            lambda: jnp.ones((1, self.num_patches, 1), jnp.float32))

        sw = is_searched.value
        z_patch = sw * searched_patch.value + (1 - sw) * jnp.tanh(patch_zeta)
        z = sw * searched_zeta.value + (1 - sw) * zeta

        x = x * z_patch.astype(x.dtype)
        qkv = Dense(3 * Cdim, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, d).transpose(2, 0, 3, 1, 4)  # 3,B,H,N,d
        qkv = qkv * z.transpose(1, 0, 2, 3, 4).astype(qkv.dtype)  # zeta on qkv
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, Cdim).astype(self.dtype)
        out = Dense(Cdim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class SparseMlp(nn.Module):
    """reference layers.py:420-473."""

    hidden_features: int
    drop: float = 0.0
    dtype: typ.Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = x.shape[-1]
        zeta = self.param("zeta", nn.initializers.ones,
                          (1, 1, self.hidden_features))
        is_searched = self.variable(PRUNING_COLLECTION, "is_searched",
                                    lambda: jnp.asarray(0.0, jnp.float32))
        searched_zeta = self.variable(
            PRUNING_COLLECTION, "searched_zeta",
            lambda: jnp.ones((1, 1, self.hidden_features), jnp.float32))
        sw = is_searched.value
        z = sw * searched_zeta.value + (1 - sw) * zeta
        x = Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = x * z.astype(x.dtype)  # eliminates fc1-out/fc2-in channels
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = Dense(out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class SparseBlock(nn.Module):
    dim: int
    num_heads: int
    num_patches: int = 197
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: typ.Any = jnp.float32
    head_search: bool = False
    uniform_search: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dp = DropPath(self.drop_path, name="drop_path")
        y = SparseAttention(
            num_heads=self.num_heads, num_patches=self.num_patches,
            qkv_bias=self.qkv_bias, attn_drop=self.attn_drop,
            proj_drop=self.drop, head_search=self.head_search,
            uniform_search=self.uniform_search, dtype=self.dtype,
            name="attn")(LayerNorm(name="norm1")(x),
                         deterministic=deterministic)
        x = x + dp(y, deterministic=deterministic)
        y = SparseMlp(hidden_features=int(self.dim * self.mlp_ratio),
                      drop=self.drop, dtype=self.dtype,
                      name="mlp")(LayerNorm(name="norm2")(x),
                                  deterministic=deterministic)
        x = x + dp(y, deterministic=deterministic)
        return x


# ---------------------------------------------------------------------------
# Network-wide pruning controller (reference base_model.py, functional form)
# ---------------------------------------------------------------------------

def _walk_sparse_modules(params: dict, prefix=()):
    """Yield (path, kind) for every Sparse layer, ordered by block index.
    kind is 'attn' (has patch_zeta) or 'mlp'."""
    for k in sorted(params.keys(),
                    key=lambda s: (len(s), s)):
        v = params[k]
        if not isinstance(v, dict):
            continue
        if "zeta" in v:
            yield prefix + (k,), ("attn" if "patch_zeta" in v else "mlp")
        else:
            yield from _walk_sparse_modules(v, prefix + (k,))


def give_zetas(params: dict):
    """All zeta values, flattened (reference base_model.py:62-76)."""
    za, zm, zp = [], [], []
    for path, kind in _walk_sparse_modules(params):
        node = _get(params, path)
        if kind == "attn":
            za.extend(np.asarray(node["zeta"]).ravel().tolist())
            zp.extend(np.tanh(np.asarray(node["patch_zeta"])).ravel().tolist())
        else:
            zm.extend(np.asarray(node["zeta"]).ravel().tolist())
    return za, zm, zp


def calculate_search_threshold(params: dict, budget_attn: float,
                               budget_mlp: float, budget_patch: float):
    """Percentile thresholds from budgets (reference base_model.py:14-22)."""
    za, zm, zp = give_zetas(params)
    za, zm, zp = sorted(za), sorted(zm), sorted(zp)
    ta = za[int((1.0 - budget_attn) * len(za))]
    tm = zm[int((1.0 - budget_mlp) * len(zm))]
    tp = zp[int((1.0 - budget_patch) * len(zp))]
    return ta, tm, tp


def get_sparsity_loss(params: dict):
    """L1 over zetas (reference base_model.py:49-60). Differentiable."""
    la = lm = lp = 0.0
    for path, kind in _walk_sparse_modules(params):
        node = _get(params, path)
        if kind == "attn":
            la = la + jnp.sum(jnp.abs(node["zeta"]))
            lp = lp + jnp.sum(jnp.abs(jnp.tanh(node["patch_zeta"])))
        else:
            lm = lm + jnp.sum(jnp.abs(node["zeta"]))
    return la, lm, lp


def compress(params: dict, pruning: dict, budget_attn: float,
             budget_mlp: float, budget_patch: float):
    """Binarize all zetas at budget thresholds; patch masks are OR-propagated
    from the LAST block backward (reference base_model.py:88-118). Returns the
    new pruning collection and the thresholds."""
    ta, tm, tp = calculate_search_threshold(params, budget_attn, budget_mlp,
                                            budget_patch)
    new_pruning = jax.tree.map(lambda x: x, pruning)
    attn_paths = []
    for path, kind in _walk_sparse_modules(params):
        node = _get(params, path)
        pnode = dict(_get(new_pruning, path))
        pnode["is_searched"] = jnp.asarray(1.0, jnp.float32)
        thr = ta if kind == "attn" else tm
        pnode["searched_zeta"] = (node["zeta"] >= thr).astype(jnp.float32)
        new_pruning = _set(new_pruning, path, pnode)
        if kind == "attn":
            attn_paths.append(path)

    # cross-layer patch-mask OR propagation, last -> first
    mask = None
    patch_masks = {}
    for path in reversed(attn_paths):
        node = _get(params, path)
        zp = np.tanh(np.asarray(node["patch_zeta"]))
        m = (zp >= tp)
        mask = m if mask is None else np.logical_or(mask, m)
        patch_masks[path] = mask.astype(np.float32)
    for path in attn_paths:
        pnode = dict(_get(new_pruning, path))
        pnode["searched_patch_zeta"] = jnp.asarray(patch_masks[path])
        new_pruning = _set(new_pruning, path, pnode)
    return new_pruning, (ta, tm, 0)


def decompress(pruning: dict):
    """reference base_model.py:134-136."""
    out = jax.tree.map(lambda x: x, pruning)

    def rec(tree, prefix=()):
        nonlocal out
        for k, v in tree.items():
            if isinstance(v, dict):
                if "is_searched" in v:
                    node = dict(_get(out, prefix + (k,)))
                    node["is_searched"] = jnp.asarray(0.0, jnp.float32)
                    out = _set(out, prefix + (k,), node)
                else:
                    rec(v, prefix + (k,))

    rec(pruning)
    return out


def get_remaining(params: dict, pruning: dict, num_patches: int):
    """Active fractions of attn/mlp/patch zetas (reference base_model.py:29-47)."""
    ra = ta_ = rm = tm_ = rp = tp_ = 0.0
    for path, kind in _walk_sparse_modules(params):
        node = _get(params, path)
        pnode = _get(pruning, path)
        searched = float(pnode["is_searched"]) > 0
        if kind == "attn":
            z = pnode["searched_zeta"] if searched else node["zeta"]
            p = (pnode["searched_patch_zeta"] if searched
                 else jnp.tanh(node["patch_zeta"]))
            ra += float(jnp.sum(z))
            ta_ += z.size
            rp += float(jnp.sum(p))
            tp_ += num_patches
        else:
            z = pnode["searched_zeta"] if searched else node["zeta"]
            rm += float(jnp.sum(z))
            tm_ += z.size
    return ra / max(ta_, 1), rm / max(tm_, 1), rp / max(tp_, 1)


def sparse_attention_flops(dim: int, num_heads: int, searched_zeta,
                           num_patches: int, active_patches: float,
                           head_search=False, uniform_search=False):
    """reference layers.py:362-383."""
    H, d = num_heads, dim // num_heads
    N, n = num_patches, active_patches
    sd = float(np.sum(np.asarray(searched_zeta)))
    if head_search:
        sd *= d
    elif uniform_search:
        sd *= H
    total = N * (H * d * (3 * H * d)) + 3 * N * H * d
    total += H * N * d * N + H * N * N
    total += 5 * H * N * N
    total += H * N * N * d
    total += N * (H * d * (H * d)) + N * H * d
    active = n * (H * d * (3 * sd)) + 3 * n * sd
    active += n * n * sd + H * n * n
    active += 5 * H * n * n
    active += n * n * sd
    active += n * (sd * (H * d)) + n * H * d
    return total, active


def sparse_mlp_params_count(dim_in: int, hidden: int, searched_zeta):
    """reference layers.py:458-464."""
    active = float(np.sum(np.asarray(searched_zeta)))
    total = 2 * (dim_in * hidden) + dim_in + hidden
    act = 2 * (dim_in * active) + dim_in + active
    return total, act


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _set(tree[path[0]], path[1:], value)
    return out


@register_model
def sparse_deit_tiny_patch16_224(pretrained=False, head_search=False,
                                 uniform_search=False, **kwargs):
    """ViT-tiny with zeta-prunable attention/MLP in every block."""
    from .vit import VisionTransformer
    from .zoo import _common_kwargs

    common = _common_kwargs(kwargs)
    img = common.get("img_size", 224)
    n_patches = (img // 16) ** 2 + 1

    def block_factory(i, **bk):
        bk.pop("use_flash", None)
        bk.pop("attn_impl", None)  # SparseAttention has its own attention path
        bk.pop("ln_impl", None)    # SparseBlock keeps plain norms
        return SparseBlock(num_patches=n_patches, head_search=head_search,
                           uniform_search=uniform_search, **bk)

    return VisionTransformer(patch_size=16, embed_dim=192, depth=12,
                             num_heads=3, mlp_ratio=4.0, qkv_bias=True,
                             block_factory=block_factory, **common)
