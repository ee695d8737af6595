"""Mesh + sharding utilities (the reference's NCCL/DDP layer, rebuilt on XLA).

The reference's parallelism is torch DDP over NCCL (``utils.py:269-296``,
``main.py:610-612``) plus FastMoE's optional NCCL all_to_all for expert
parallelism. The TPU-native design replaces all of it with one device mesh and
sharding annotations; XLA inserts the collectives (grad psum over the ``data``
axis, all_to_all over the ``expert`` axis) on ICI:

- batch is sharded over ``data``
- dense params are replicated
- expert params and MoE dispatch buffers are sharded over ``expert``
"""
from __future__ import annotations

import typing as typ

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
EXPERT_AXIS = "expert"


def make_mesh(n_data: int = -1, n_expert: int = 1,
              devices: typ.Optional[typ.Sequence] = None) -> Mesh:
    """Create a (data, expert) mesh. ``n_data=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        assert len(devices) % n_expert == 0
        n_data = len(devices) // n_expert
    devs = np.asarray(devices[: n_data * n_expert]).reshape(n_data, n_expert)
    return Mesh(devs, (DATA_AXIS, EXPERT_AXIS))


def active_mesh_axes() -> typ.FrozenSet[str]:
    """Axis names of the mesh currently in scope (via ``jax.set_mesh`` /
    ``use_mesh`` or inside shard_map), or empty when unsharded."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:
        return frozenset()
    if mesh is None:
        return frozenset()
    try:
        return frozenset(mesh.axis_names)
    except Exception:
        return frozenset()


def mesh_axis_size(name: str) -> int:
    """Size of a mesh axis in the ambient mesh, or 1 when absent/no mesh."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or name not in mesh.axis_names:
            return 1
        return int(mesh.shape[name])
    except Exception:  # noqa: BLE001 - no mesh in scope
        return 1


def constrain(x, spec: typ.Sequence[typ.Optional[str]]):
    """``with_sharding_constraint`` that degrades to identity with no mesh.

    Axis names not present in the active mesh are replaced by None, so model
    code can unconditionally annotate (e.g. the MoE dispatch buffer with
    ``('expert', None, None)``) and still run single-chip.
    """
    axes = active_mesh_axes()
    clean = tuple(s if (s in axes) else None for s in spec)
    if not any(clean):
        return x
    return jax.lax.with_sharding_constraint(x, P(*clean))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh: expert-major tensors (leading dim ==
    mesh expert size and path containing 'expert') shard over ``expert``;
    everything else replicates.

    flax ``nn.with_partitioning`` metadata is the long-term route; this helper
    keys on param paths so plain pytrees work too.
    """
    n_expert = mesh.shape[EXPERT_AXIS]

    def place(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        is_expert = any("expert" in str(n) for n in names)
        if is_expert and leaf.ndim >= 1 and leaf.shape[0] % max(n_expert, 1) == 0:
            spec = P(EXPERT_AXIS, *([None] * (leaf.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
