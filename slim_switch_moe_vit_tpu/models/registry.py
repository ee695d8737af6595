"""Model registry — ``create_model(name, **kwargs)`` by string name.

Mirrors the timm-registry surface the reference driver relies on
(``main.py:22,519-530`` via ``timm.models.create_model`` and the
``@register_model`` decorators in ``models/model.py`` / ``models/resMoE.py``)
without depending on timm: a plain dict of constructor functions.
"""
from __future__ import annotations

import typing as typ

_REGISTRY: typ.Dict[str, typ.Callable] = {}


def register_model(fn: typ.Callable) -> typ.Callable:
    _REGISTRY[fn.__name__] = fn
    return fn


def create_model(name: str, **kwargs):
    """Build a model definition by registry name.

    Returns the flax Module. Unknown kwargs accepted by the reference's timm
    path (e.g. ``pretrained``) are threaded to the constructor functions.
    """
    if name not in _REGISTRY:
        raise ValueError(
            f"Unknown model '{name}'. Available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](**kwargs)


def list_models() -> typ.List[str]:
    return sorted(_REGISTRY)
