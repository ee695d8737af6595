"""Experimental Pallas gather/scatter kernels — interpreter-mode contract.

Hardware correctness is currently failing on this toolchain (see module
docstring); the kernels are quarantined out of the model path.
"""
import jax
import jax.numpy as jnp
import numpy as np

from slim_switch_moe_vit_tpu.ops.gather_pallas import (
    _gather_impl, _scatter_add_impl,
)


def test_gather_interpret_matches_take():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1000, 192), jnp.float32)
    idx = jnp.asarray(rs.randint(0, 1000, 2048), jnp.int32)
    got = _gather_impl(x, idx, block_m=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(x)[np.asarray(idx)], atol=1e-5)


def test_scatter_add_interpret_matches_oracle():
    rs = np.random.RandomState(1)
    idx = jnp.asarray(rs.randint(0, 500, 1024), jnp.int32)
    g = jnp.asarray(rs.randn(1024, 192), jnp.float32)
    got = _scatter_add_impl(g, idx, 500, block_m=256, interpret=True)
    want = np.zeros((500, 192), np.float32)
    np.add.at(want, np.asarray(idx), np.asarray(g))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
