"""Padding helpers (host-side, numpy) + mask builders (device-side, jnp).

Reference: src/utils/utils.py `pad_list`, src/transformer/encoder.py
`get_non_pad_mask`/`get_attn_pad_mask`, src/transformer/decoder.py
`get_subsequent_mask`. Here padding is to *static bucket shapes*, not batch
max, so XLA compiles one program per bucket.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pad_list(arrays, pad_value, target_len: int | None = None) -> np.ndarray:
    """Stack variable-length numpy arrays, padding the first axis.

    target_len pins a static padded length (bucket boundary); default is the
    batch max (reference behavior).
    """
    arrays = [np.asarray(a) for a in arrays]
    max_len = max(a.shape[0] for a in arrays)
    tlen = target_len if target_len is not None else max_len
    assert tlen >= max_len, (tlen, max_len)
    out = np.full((len(arrays), tlen, *arrays[0].shape[1:]), pad_value,
                  dtype=arrays[0].dtype)
    for i, a in enumerate(arrays):
        out[i, : a.shape[0]] = a
    return out


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] boolean, True at PAD positions."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]


def make_valid_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] boolean, True at VALID positions."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def make_causal_mask(size: int) -> jnp.ndarray:
    """[size, size] boolean, True where attention is ALLOWED (lower tri)."""
    return jnp.tril(jnp.ones((size, size), dtype=bool))
