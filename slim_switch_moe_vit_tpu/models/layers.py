"""Core NN layers for the TPU-native ViT stack.

TPU-first re-designs of the layers the reference pulls from timm or
reimplements itself (reference: ``models/layers.py``, ``models/vision_transformer.py``):

- ``PatchEmbed`` is an extract-patches reshape + single dense matmul rather than a
  conv — identical math for stride==kernel "conv", and it maps directly onto the
  MXU without relying on conv lowering.
- ``DropPath`` (stochastic depth) draws one Bernoulli per sample from an explicit
  PRNG key (functional, jit-safe).
- ``LayerNorm``/``Mlp`` are thin flax modules kept here so every model file in
  this package depends only on this module, not on flax internals.

Parity notes: weight init mirrors timm/DeiT defaults — trunc_normal(std=0.02)
for linear weights, zeros for biases, LayerNorm ones/zeros
(reference: ``models/vision_transformer.py:851-885`` ``_init_vit_weights``).
"""
from __future__ import annotations

import os
import typing as typ

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = typ.Any

# timm's trunc_normal_ truncates at +/-2 std.
def trunc_normal_init(std: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


# DeiT/timm linear layers use trunc_normal(0.02) weights and zero bias.
DEFAULT_KERNEL_INIT = trunc_normal_init(0.02)


class Dense(nn.Module):
    """Linear layer with DeiT-parity init. Computes in ``dtype`` (bf16 on TPU),
    stores params in fp32."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: typ.Callable = DEFAULT_KERNEL_INIT

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm over the trailing dim, eps=1e-6 to match DeiT's
    ``partial(nn.LayerNorm, eps=1e-6)`` (reference: ``models/model.py:89``).

    Stats are computed in fp32 regardless of the activation dtype — on TPU the
    cast is free relative to the HBM read, and bf16 variance underflows.

    ``residual``: fuse the preceding residual add into the norm — returns
    ``(u, y) = (x + residual, LN(x + residual))``. With ``impl='fused'`` (or
    'auto' on TPU) the add+norm chain runs as a single-pass Pallas kernel
    (``ops/fused_ln.py``); the XLA path computes identical math unfused.
    """

    eps: float = 1e-6
    use_scale: bool = True
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    impl: str = "xla"  # 'xla' | 'fused' | 'auto'

    def _fused_ok(self, x) -> bool:
        if self.impl == "xla" or not (self.use_scale and self.use_bias):
            return False
        from ..ops.fused_ln import profitable, supported

        if not supported(x):
            return False
        if self.impl == "fused":
            return True
        # 'auto': fused only where it measured faster than XLA LN —
        # lane-aligned channel widths (ops/fused_ln.py::profitable)
        return jax.default_backend() == "tpu" and profitable(x)

    @nn.compact
    def __call__(self, x, residual=None, emit_sum: bool = True):
        """``residual``: fold the preceding add into the norm. With
        ``emit_sum`` the call returns ``(x + residual, LN(x + residual))``;
        without it only the normalized value (for norm-through-residual
        wiring, where the raw sum is never read again)."""
        dim = x.shape[-1]
        scale = (self.param("scale", nn.initializers.ones, (dim,))
                 if self.use_scale else None)
        bias = (self.param("bias", nn.initializers.zeros, (dim,))
                if self.use_bias else None)

        if self._fused_ok(x):
            from ..ops.fused_ln import fused_add_ln, fused_ln, fused_sum_ln

            if os.environ.get("SSMV_LN_BARRIER", "0") == "1":
                # layout experiment (VERDICT r3 #4 / scripts/
                # bench_ln_layout_r4.py): an optimization_barrier pins the
                # operand's layout choice at the producer, probing whether
                # XLA's {2,1,0}->{2,0,1} copy before the LN pallas call
                # (0.79 ms/fwd at cfg1) is assignment-driven or mandatory
                x = jax.lax.optimization_barrier(x)
                if residual is not None:
                    residual = jax.lax.optimization_barrier(residual)
            if residual is None:
                return fused_ln(x, scale, bias, self.eps)
            if emit_sum:
                return fused_add_ln(x, residual.astype(x.dtype), scale, bias,
                                    self.eps)
            return fused_sum_ln(x, residual.astype(x.dtype), scale, bias,
                                self.eps)

        u = x if residual is None else x + residual
        if os.environ.get("SSMV_LN_SPLIT_STATS", "0") == "1":
            # fusion-boundary experiment (VERDICT r4 #6, cfg1's
            # fc2+residual+LN-stat seam at 3.62 vs 3.2 ms): XLA fuses the
            # next LN's stat reduce INTO the fc2 GEMM fusion; a reduce
            # epilogue can deoptimize the GEMM's tile loop. The barrier
            # splits the graph at u: GEMM+add keep their fusion, the stats
            # re-read u as their own fusion (+~0.03 ms HBM at cfg1 scale) —
            # a win iff the unencumbered GEMM recovers more than that.
            u = jax.lax.optimization_barrier(u)
        orig_dtype = u.dtype
        x32 = u.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        d = x32 - mean
        var = jnp.mean(d * d, axis=-1, keepdims=True)
        y = d * jax.lax.rsqrt(var + self.eps)
        if scale is not None:
            y = y * scale
        if bias is not None:
            y = y + bias
        y = y.astype(orig_dtype)
        if residual is None or not emit_sum:
            return y
        return u, y


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample.

    Matches timm's ``DropPath`` used in ``Block`` (reference:
    ``models/vision_transformer.py:308``): at train time, scale kept branches by
    1/keep_prob; identity at eval.
    """

    rate: float = 0.0
    deterministic: typ.Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: typ.Optional[bool] = None):
        deterministic = nn.merge_param("deterministic", self.deterministic, deterministic)
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Mlp(nn.Module):
    """Transformer FFN: fc1 → GELU → drop → fc2 → drop
    (reference: ``models/layers.py:391-414``)."""

    hidden_features: int
    out_features: typ.Optional[int] = None
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from ..ops.fused_ffn import gelu_fast

        out_features = self.out_features or x.shape[-1]
        x = Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = gelu_fast(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = Dense(out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class PatchEmbed(nn.Module):
    """Image → patch tokens.

    The reference uses a stride-16 conv (timm ``PatchEmbed``, used at
    ``models/vision_transformer.py:819``). A stride==kernel conv is exactly a
    block reshape followed by one big matmul — we implement it that way so the
    FLOPs land on the MXU as a single (B*N, p*p*C) @ (p*p*C, D) GEMM instead of
    going through conv lowering.
    """

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    dtype: Dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) channels-last (TPU-native layout).
        B, H, W, C = x.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        x = x.reshape(B, gh, p, gw, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)
        # Conv-equivalent init: timm initializes patch conv like a linear layer.
        x = Dense(self.embed_dim, dtype=self.dtype, name="proj")(x)
        return x  # (B, N, D)
