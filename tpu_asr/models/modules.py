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


class PostNormBlock(nn.Module):
    """residual + dropout + LayerNorm (post-norm, reference convention)."""
    d_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, residual, sublayer_out, deterministic: bool = True):
        h = nn.Dropout(self.dropout)(sublayer_out, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype)(residual + h)
