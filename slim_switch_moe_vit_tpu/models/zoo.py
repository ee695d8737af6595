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
    if "ln_impl" in kwargs:
        out["ln_impl"] = kwargs["ln_impl"]
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


# ---------------------------------------------------------------------------
# timm-compat classic ViT registrations (reference:
# models/vision_transformer.py:1083-1490). The reference registers 32 names
# in vision_transformer.py; its training surface never instantiates them, but
# the names are part of its model registry. All 32 are registered below
# (plus a few expressible extras: patch8, huge-224, 384px deit): the
# 1k variants, the 8 ``*_in21k`` variants (num_classes 21843; large-p32 and
# huge carry the pre-logits representation layer,
# vision_transformer.py:1305-1355), and the 2 ``*_miil`` variants
# (qkv_bias=False, vision_transformer.py:1465-1490). ``pretrained`` URLs are
# unreachable here; checkpoints load via the utils/checkpoint.py importers
# (.npz flax / torch .pth), which handle the pre-logits tensors.
# ---------------------------------------------------------------------------

def _register_timm_vits():
    specs = {
        "vit_tiny_patch16_224": dict(embed_dim=192, num_heads=3),
        "vit_tiny_patch16_384": dict(embed_dim=192, num_heads=3, img=384),
        "vit_small_patch32_224": dict(patch_size=32, embed_dim=384, num_heads=6),
        "vit_small_patch32_384": dict(patch_size=32, embed_dim=384,
                                      num_heads=6, img=384),
        "vit_small_patch16_224": dict(embed_dim=384, num_heads=6),
        "vit_small_patch16_384": dict(embed_dim=384, num_heads=6, img=384),
        "vit_base_patch32_224": dict(patch_size=32, embed_dim=768, num_heads=12),
        "vit_base_patch32_384": dict(patch_size=32, embed_dim=768,
                                     num_heads=12, img=384),
        "vit_base_patch16_224": dict(embed_dim=768, num_heads=12),
        "vit_base_patch16_384": dict(embed_dim=768, num_heads=12, img=384),
        "vit_base_patch8_224": dict(patch_size=8, embed_dim=768, num_heads=12),
        "vit_large_patch32_224": dict(patch_size=32, embed_dim=1024,
                                      num_heads=16, depth=24),
        "vit_large_patch32_384": dict(patch_size=32, embed_dim=1024,
                                      num_heads=16, depth=24, img=384),
        "vit_large_patch16_224": dict(embed_dim=1024, num_heads=16, depth=24),
        "vit_large_patch16_384": dict(embed_dim=1024, num_heads=16, depth=24,
                                      img=384),
        "vit_huge_patch14_224": dict(patch_size=14, embed_dim=1280,
                                     num_heads=16, depth=32),
        # imagenet-21k heads (vision_transformer.py:1239-1355): default 21843
        # classes; the large-p32 / huge checkpoints keep the pre-logits layer.
        "vit_tiny_patch16_224_in21k": dict(embed_dim=192, num_heads=3,
                                           classes=21843),
        "vit_small_patch32_224_in21k": dict(patch_size=32, embed_dim=384,
                                            num_heads=6, classes=21843),
        "vit_small_patch16_224_in21k": dict(embed_dim=384, num_heads=6,
                                            classes=21843),
        "vit_base_patch32_224_in21k": dict(patch_size=32, embed_dim=768,
                                           num_heads=12, classes=21843),
        "vit_base_patch16_224_in21k": dict(embed_dim=768, num_heads=12,
                                           classes=21843),
        "vit_large_patch32_224_in21k": dict(patch_size=32, embed_dim=1024,
                                            num_heads=16, depth=24,
                                            representation_size=1024,
                                            classes=21843),
        "vit_large_patch16_224_in21k": dict(embed_dim=1024, num_heads=16,
                                            depth=24, classes=21843),
        "vit_huge_patch14_224_in21k": dict(patch_size=14, embed_dim=1280,
                                           num_heads=16, depth=32,
                                           representation_size=1280,
                                           classes=21843),
        # Alibaba-MIIL weights (vision_transformer.py:1465-1490): no qkv bias.
        "vit_base_patch16_224_miil_in21k": dict(embed_dim=768, num_heads=12,
                                                qkv_bias=False, classes=11221),
        "vit_base_patch16_224_miil": dict(embed_dim=768, num_heads=12,
                                          qkv_bias=False),
    }

    def make(spec):
        def ctor(pretrained=False, **kwargs):
            s = dict(spec)
            img = s.pop("img", None)
            classes = s.pop("classes", None)
            if img is not None:
                kwargs.setdefault("img_size", img)
            if classes is not None:
                kwargs.setdefault("num_classes", classes)
            return _vit(**s, **_common_kwargs(kwargs))
        return ctor

    for name, spec in specs.items():
        ctor = make(spec)
        ctor.__name__ = name
        register_model(ctor)


_register_timm_vits()
