"""Conv2d subsampling front-end: 4x time reduction into d_model.

Reference: the eastonYi conv front-end (src/models/conv_encoder.py style —
two Conv2d(stride=2)+ReLU over (time, freq), then a linear projection to
d_model), the standard espnet Conv2dSubsampling. VALID padding keeps the
length arithmetic exact: t' = ((t-1)//2 - 1)//2.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class Conv2dSubsampling(nn.Module):
    d_model: int
    channels: int | tuple[int, int] = 256   # int, or (conv1, conv2) channels
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, feat_lengths: jnp.ndarray):
        """[B, T, D] + [B] -> ([B, T', d_model], [B] subsampled lengths)."""
        c1, c2 = (self.channels if isinstance(self.channels, (tuple, list))
                  else (self.channels, self.channels))
        x = feats[..., None]  # [B, T, D, 1]
        x = nn.Conv(c1, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(c2, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv2")(x)
        x = nn.relu(x)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = nn.Dense(self.d_model, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="out")(x)
        out_lengths = ((feat_lengths - 1) // 2 - 1) // 2
        return x, jnp.maximum(out_lengths, 0)
