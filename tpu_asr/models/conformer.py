"""Conformer encoder blocks (Gulati et al., arXiv:2005.08100) — beyond the
reference's vanilla Transformer encoder (SURVEY.md section 2 lists only
post-norm MHSA+FFN layers). The conformer is the de-facto standard ASR
encoder; here it is a drop-in `ModelConfig.encoder_type = "conformer"`
swap under every objective (ctc / attention / hybrid / cif / transducer) —
the losses, decoders, buckets and CLIs are unchanged.

TPU-first notes:

* Relative-position MHSA (Transformer-XL style): the [T, 2T-1] relative
  score matrix is realigned with the classic pad-reshape shift — pure
  static-shape reshapes that XLA folds into layout changes, instead of a
  [B, H, T, T] gather (TPU gathers are slow; ops/ctc.py measured ~5x on
  the vocab axis). Correctness is pinned against an explicit
  take_along_axis oracle in tests/unit/test_conformer.py.

* Conv module: pointwise GLU -> depthwise conv -> norm -> swish ->
  pointwise, with padded frames ZEROED before the conv so outputs are
  invariant to the static bucket width (the same discipline as the
  encoder's output masking). With a chunk-masked encoder
  (enc_chunk_size > 0) the depthwise conv becomes CAUSAL (left-padded
  only), so a chunk's outputs never depend on future frames and offline
  chunked decode stays final per chunk.

* Norm inside the conv module is LayerNorm over channels rather than the
  paper's BatchNorm: functionally stateless (no batch_stats collection
  threading through TrainState/checkpoints), standard substitution in
  production conformers, and it keeps the whole train step one pure jit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_asr.models.config import ModelConfig
from tpu_asr.models.modules import PositionwiseFeedForward


def rel_sinusoid_table(t: int, d_model: int) -> np.ndarray:
    """[2T-1, d_model] embeddings for relative distances T-1 .. -(T-1)
    (descending, Transformer-XL convention: row j encodes distance
    T-1-j)."""
    pos = np.arange(t - 1, -t, -1, dtype=np.float64)[:, None]
    dim = np.arange(d_model, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2 * (dim // 2) / d_model)
    table = np.where(dim % 2 == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, 2T-1] raw position scores -> [B, H, T, T] aligned so that
    out[..., i, j] = x[..., i, (T-1) + (j - i)] — i.e. column j scores
    relative distance i - j under the descending rel_sinusoid_table.

    The pad-reshape trick: pad one column on the left, fold the length-2T
    rows over, drop the first row, truncate. Static shapes only.
    """
    b, h, t, n = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))     # [B, H, T, 2T]
    x = x.reshape(b, h, n + 1, t)
    x = x[:, :, 1:].reshape(b, h, t, n)
    return x[..., :t]


class RelPosMultiHeadAttention(nn.Module):
    """MHSA with Transformer-XL relative position scores:
    score = (q + u)k^T + rel_shift((q + v)p^T), per Conformer."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, pos_emb, bias, deterministic: bool = True):
        c = self.cfg
        h, dh = c.num_heads, c.d_head
        dense = lambda name: nn.DenseGeneral(
            (h, dh), dtype=c.dtype, param_dtype=c.param_dtype, name=name)
        q = dense("q_proj")(x)                            # [B, T, H, dh]
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)
        p = nn.DenseGeneral((h, dh), use_bias=False, dtype=c.dtype,
                            param_dtype=c.param_dtype,
                            name="pos_proj")(pos_emb)     # [2T-1, H, dh]
        u_bias = self.param("u_bias", nn.initializers.zeros, (h, dh),
                            c.param_dtype).astype(c.dtype)
        v_bias = self.param("v_bias", nn.initializers.zeros, (h, dh),
                            c.param_dtype).astype(c.dtype)
        content = jnp.einsum("bqhd,bkhd->bhqk", q + u_bias, k)
        pos_score = jnp.einsum("bqhd,nhd->bhqn", q + v_bias, p)
        pos_score = rel_shift(pos_score)                  # [B, H, T, T]
        scale = jnp.sqrt(jnp.asarray(dh, jnp.float32)).astype(c.dtype)
        scores = (content + pos_score) / scale
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return nn.DenseGeneral(c.d_model, axis=(-2, -1), dtype=c.dtype,
                               param_dtype=c.param_dtype,
                               name="out_proj")(out)


class ConvModule(nn.Module):
    """Pointwise-GLU -> depthwise conv -> LN -> swish -> pointwise.

    Padded frames are zeroed on entry so the depthwise window only ever
    mixes real frames with exact zeros — outputs are invariant to the
    bucket's pad width. causal=True pads left only (streaming finality).
    """
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, valid, deterministic: bool = True):
        c = self.cfg
        x = jnp.where(valid[..., None], x, 0.0)
        h = nn.Dense(2 * c.d_model, dtype=c.dtype,
                     param_dtype=c.param_dtype, name="pw1")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)                         # GLU
        h = jnp.where(valid[..., None], h, 0.0)
        kern = c.conv_kernel
        causal = c.enc_chunk_size > 0
        pad = ((kern - 1, 0),) if causal else \
            (((kern - 1) // 2, kern // 2),)
        h = nn.Conv(c.d_model, kernel_size=(kern,), padding=pad,
                    feature_group_count=c.d_model, dtype=c.dtype,
                    param_dtype=c.param_dtype, name="depthwise")(h)
        h = nn.LayerNorm(dtype=c.dtype, name="norm")(h)
        h = nn.swish(h)
        h = nn.Dense(c.d_model, dtype=c.dtype,
                     param_dtype=c.param_dtype, name="pw2")(h)
        return nn.Dropout(c.dropout)(h, deterministic=deterministic)


class ConformerLayer(nn.Module):
    """Pre-norm macaron block: 1/2 FFN -> rel-pos MHSA -> conv -> 1/2 FFN
    -> final LN."""
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.ffn1 = PositionwiseFeedForward(
            c.d_model, c.d_inner, c.dropout, c.dtype, c.param_dtype)
        self.ffn2 = PositionwiseFeedForward(
            c.d_model, c.d_inner, c.dropout, c.dtype, c.param_dtype)
        self.slf_attn = RelPosMultiHeadAttention(c)
        self.conv = ConvModule(c)
        self.norm_ffn1 = nn.LayerNorm(dtype=c.dtype)
        self.norm_attn = nn.LayerNorm(dtype=c.dtype)
        self.norm_conv = nn.LayerNorm(dtype=c.dtype)
        self.norm_ffn2 = nn.LayerNorm(dtype=c.dtype)
        self.norm_out = nn.LayerNorm(dtype=c.dtype)
        self.dropout = nn.Dropout(c.dropout)

    def __call__(self, x, pos_emb, bias, valid, deterministic: bool = True):
        x = x + 0.5 * self.ffn1(self.norm_ffn1(x),
                                deterministic=deterministic)
        h = self.slf_attn(self.norm_attn(x), pos_emb, bias,
                          deterministic=deterministic)
        x = x + self.dropout(h, deterministic=deterministic)
        x = x + self.conv(self.norm_conv(x), valid,
                          deterministic=deterministic)
        x = x + 0.5 * self.ffn2(self.norm_ffn2(x),
                                deterministic=deterministic)
        return self.norm_out(x)
