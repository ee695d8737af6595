"""Model definitions and registry.

Importing this package registers all model constructors (the reference relies
on timm's import-time registration, ``models/__init__.py:1-2``).
"""
from . import zoo  # noqa: F401
from . import resmoe  # noqa: F401
from . import regnet  # noqa: F401
from . import sparse  # noqa: F401
from . import switchable  # noqa: F401
from .gates import TokenGate  # noqa: F401
from .moe import MoEMlp  # noqa: F401
from .registry import create_model, list_models, register_model  # noqa: F401
from .regnet import RegNet  # noqa: F401
from .resmoe import ResMoEBlock  # noqa: F401
from .sparse import SparseAttention, SparseBlock, SparseMlp  # noqa: F401
from .switchable import (  # noqa: F401
    SwitchableLayerNorm, SwitchableVisionTransformer,
)
from .vit import Attention, Block, VisionTransformer  # noqa: F401
