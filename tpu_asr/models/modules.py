"""Shared transformer building blocks.

Reference: src/transformer/module.py (`PositionalEncoding`,
`PositionwiseFeedForward`) and the post-norm residual wiring of
src/transformer/encoder.py / decoder.py. Kept as small flax.linen modules so
XLA fuses the elementwise chains into the surrounding matmuls.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn


def sinusoid_table(max_len: int, d_model: int) -> np.ndarray:
    """[max_len, d_model] sinusoidal position encodings (Vaswani et al.)."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    dim = np.arange(d_model, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2 * (dim // 2) / d_model)
    table = np.where(dim % 2 == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)


class PositionalEncoding(nn.Module):
    d_model: int
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, offset: int | jnp.ndarray = 0):
        table = jnp.asarray(sinusoid_table(self.max_len, self.d_model))
        t = x.shape[-2]
        if isinstance(offset, int) and offset == 0:
            pe = table[:t]
        else:
            pe = jnp.take(table, offset + jnp.arange(t), axis=0)
        return x + pe.astype(self.dtype)


class PositionwiseFeedForward(nn.Module):
    d_model: int
    d_inner: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.d_inner, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="w_1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="w_2")(h)
        return h


class _LayerNormParams(nn.Module):
    """Bare scale/bias holder with nn.LayerNorm's param names — keeps the
    checkpoint tree identical whether the Pallas LN kernel is on or off."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class PostNormBlock(nn.Module):
    """residual + dropout + LayerNorm (post-norm, reference convention).

    use_pallas routes big [N, D] shapes through the fused residual+LN
    Pallas kernel (one VMEM pass instead of XLA's stats+normalize pair);
    small shapes (decode steps) stay on the XLA path where the kernel's
    row-tile padding would dominate.
    """
    d_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, residual, sublayer_out, deterministic: bool = True):
        h = nn.Dropout(self.dropout)(sublayer_out, deterministic=deterministic)
        rows = 1
        for s in residual.shape[:-1]:
            rows *= s
        if self.use_pallas and rows >= 512:
            from tpu_asr.ops.pallas.layernorm import layer_norm_residual
            scale, bias = _LayerNormParams(self.d_model,
                                           name="LayerNorm_0")()
            return layer_norm_residual(residual, h, scale, bias)
        return nn.LayerNorm(dtype=self.dtype, name="LayerNorm_0")(
            residual + h)
