"""slim_switch_moe_vit_tpu — a TPU-native Slim/Switch-MoE Vision Transformer framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the reference
``d0-rb/slim-switch-moe-vit`` (DeiT training + Switch-MoE ViT + learned token
skipping + continual learning), designed TPU-first:

- functional flax.linen models, one jitted ``train_step`` under a device mesh
- Switch-MoE dispatch as sort-based gather + grouped expert matmul (MXU), with
  expert parallelism via ``all_to_all`` over ICI (reference: external FastMoE
  CUDA kernels + NCCL, imported at ``models/resMoE.py:6``)
- token-skip gates as straight-through-estimator masks with annealed threshold
  state carried in the train state (reference: ``models/resMoE.py:32-85``)
- Orbax checkpointing, host-side data decode + on-device augmentation
"""

__version__ = "0.1.0"

from . import models  # noqa: F401  (populates the model registry)
from .models.registry import create_model, list_models  # noqa: F401
