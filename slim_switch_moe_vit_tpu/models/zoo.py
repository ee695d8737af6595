"""DeiT model zoo registrations (reference: ``models/model.py:80-300``).

Each registration matches the reference's name and architecture hyperparameters:
deit_{tiny,small,base}[_distilled]_patch16_{224,384}. ``pretrained`` URLs are not
fetchable in this environment; pretrained weights load via
``utils/checkpoint.py`` torch/.npz importers instead.
"""
from __future__ import annotations

import jax.numpy as jnp

from .registry import register_model
from .vit import VisionTransformer


def _vit(distilled=False, **over):
    defaults = dict(
        patch_size=16,
        embed_dim=768,
        depth=12,
        num_heads=12,
        mlp_ratio=4.0,
        qkv_bias=True,
        distilled=distilled,
    )
    defaults.update(over)
    return VisionTransformer(**defaults)


def _common_kwargs(kwargs):
    """Map reference CLI kwargs (main.py:520-530) onto VisionTransformer fields."""
    out = {}
    if "num_classes" in kwargs:
        out["num_classes"] = kwargs["num_classes"]
    if "img_size" in kwargs:
        out["img_size"] = kwargs["img_size"]
    if "drop_rate" in kwargs:
        out["drop_rate"] = kwargs["drop_rate"]
    if "drop_path_rate" in kwargs:
        out["drop_path_rate"] = kwargs["drop_path_rate"]
    if "dtype" in kwargs:
        out["dtype"] = kwargs["dtype"]
    if "use_flash" in kwargs:
        out["use_flash"] = kwargs["use_flash"]
    if "attn_impl" in kwargs:
        out["attn_impl"] = kwargs["attn_impl"]
    return out


@register_model
def deit_tiny_patch16_224(pretrained=False, **kwargs):
    return _vit(embed_dim=192, num_heads=3, **_common_kwargs(kwargs))


@register_model
def deit_small_patch16_224(pretrained=False, **kwargs):
    return _vit(embed_dim=384, num_heads=6, **_common_kwargs(kwargs))


@register_model
def deit_base_patch16_224(pretrained=False, **kwargs):
    return _vit(embed_dim=768, num_heads=12, **_common_kwargs(kwargs))


@register_model
def deit_tiny_distilled_patch16_224(pretrained=False, **kwargs):
    return _vit(distilled=True, embed_dim=192, num_heads=3, **_common_kwargs(kwargs))


@register_model
def deit_small_distilled_patch16_224(pretrained=False, **kwargs):
    return _vit(distilled=True, embed_dim=384, num_heads=6, **_common_kwargs(kwargs))


@register_model
def deit_base_distilled_patch16_224(pretrained=False, **kwargs):
    return _vit(distilled=True, embed_dim=768, num_heads=12, **_common_kwargs(kwargs))


@register_model
def deit_base_patch16_384(pretrained=False, **kwargs):
    kwargs.setdefault("img_size", 384)
    return _vit(embed_dim=768, num_heads=12, **_common_kwargs(kwargs))


@register_model
def deit_base_distilled_patch16_384(pretrained=False, **kwargs):
    kwargs.setdefault("img_size", 384)
    return _vit(distilled=True, embed_dim=768, num_heads=12, **_common_kwargs(kwargs))
