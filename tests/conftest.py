"""Test config: force an 8-device virtual CPU platform so multi-chip sharding
(pjit over a data×expert mesh, MoE all_to_all) is exercised without TPUs.

Note: this environment's sitecustomize registers the ``axon`` TPU platform and
overrides JAX_PLATFORMS, so the env var alone is not enough — we also update
jax.config after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
