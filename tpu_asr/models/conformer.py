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
  only), so a chunk's outputs never depend on future frames and the
  streaming recognizers' incremental path works unchanged: the encoder
  chunk step (Encoder.encode_chunk) carries per-layer attention K/V
  caches PLUS a (kernel-1)-frame post-GLU conv cache, and its outputs
  equal the offline pass exactly (tested).

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

    def setup(self):
        c = self.cfg
        h, dh = c.num_heads, c.d_head
        dense = lambda: nn.DenseGeneral(
            (h, dh), dtype=c.dtype, param_dtype=c.param_dtype)
        self.q_proj = dense()
        self.k_proj = dense()
        self.v_proj = dense()
        self.pos_proj = nn.DenseGeneral(
            (h, dh), use_bias=False, dtype=c.dtype,
            param_dtype=c.param_dtype)
        self.out_proj = nn.DenseGeneral(
            c.d_model, axis=(-2, -1), dtype=c.dtype,
            param_dtype=c.param_dtype)
        self.u_bias = self.param("u_bias", nn.initializers.zeros, (h, dh),
                                 c.param_dtype)
        self.v_bias = self.param("v_bias", nn.initializers.zeros, (h, dh),
                                 c.param_dtype)

    def _finish(self, content, pos_score, v, bias):
        c = self.cfg
        scale = jnp.sqrt(jnp.asarray(c.d_head, jnp.float32)).astype(c.dtype)
        scores = (content + pos_score) / scale
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return self.out_proj(out)

    def __call__(self, x, pos_emb, bias, deterministic: bool = True):
        c = self.cfg
        q = self.q_proj(x)                                # [B, T, H, dh]
        k = self.k_proj(x)
        v = self.v_proj(x)
        p = self.pos_proj(pos_emb)                        # [2T-1, H, dh]
        u_bias = self.u_bias.astype(c.dtype)
        v_bias = self.v_bias.astype(c.dtype)
        content = jnp.einsum("bqhd,bkhd->bhqk", q + u_bias, k)
        pos_score = jnp.einsum("bqhd,nhd->bhqn", q + v_bias, p)
        pos_score = rel_shift(pos_score)                  # [B, H, T, T]
        return self._finish(content, pos_score, v, bias)

    def step(self, x_chunk, pos, k_cache, v_cache, bias):
        """Streaming chunk step: x_chunk [B, C, D] at global positions
        pos..pos+C-1; k/v caches [B, t_max, H, dh] are appended at pos.
        Relative scores against ALL cached positions come from the full
        [2*t_max-1] table; each chunk query gathers its own diagonal
        (C is small, so the gather is cheap here — offline uses the
        rel_shift reshape instead). Returns (out [B, C, D], k, v)."""
        c = self.cfg
        b, ck, _ = x_chunk.shape
        t_max = k_cache.shape[1]
        q = self.q_proj(x_chunk)
        k_t = self.k_proj(x_chunk)
        v_t = self.v_proj(x_chunk)
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k_t, pos,
                                                      axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v_t, pos,
                                                      axis=1)
        table = jnp.asarray(rel_sinusoid_table(t_max, c.d_model)).astype(
            c.dtype)                                      # [2*t_max-1, D]
        p = self.pos_proj(table)                          # [2*t_max-1, H, dh]
        u_bias = self.u_bias.astype(c.dtype)
        v_bias = self.v_bias.astype(c.dtype)
        content = jnp.einsum("bqhd,bkhd->bhqk", q + u_bias, k_cache)
        pos_full = jnp.einsum("bqhd,nhd->bhqn", q + v_bias, p)
        # table row for distance d is (t_max-1) - d; query i at global
        # gi = pos + i, key j -> d = gi - j
        gi = pos + jnp.arange(ck)                          # [C]
        idx = (t_max - 1) - (gi[:, None] - jnp.arange(t_max)[None, :])
        idx = jnp.clip(idx, 0, 2 * t_max - 2)              # [C, t_max]
        pos_score = jnp.take_along_axis(
            pos_full, idx[None, None], axis=3)             # [B, H, C, t_max]
        out = self._finish(content, pos_score, v_cache, bias)
        return out, k_cache, v_cache


class DepthwiseConv1d(nn.Module):
    """Depthwise conv as kernel-many shifted multiply-adds.

    NOT a grouped lax.conv, for two TPU reasons: (1) groups == channels
    convolutions underuse the MXU (each "matmul" is 1x1xk — VPU
    elementwise work is the right tool, and XLA fuses the k shifted
    multiplies into one pass); (2) observed miscompile — XLA's SPMD
    partitioner produces a wrong GRADIENT for the grouped-conv kernel
    under a 2-D (data, model) mesh (dp=4 x tp=2: kernel grad off by
    O(1) while pure dp=8 / pure tp=2 are exact to 1e-7;
    tests/unit/test_mesh_families.py pins this).

    Param layout matches flax nn.Conv(feature_group_count=C) — kernel
    [k, 1, C], bias [C] — so existing checkpoints restore unchanged.
    """
    features: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        """h [B, T + k - 1, C] (already padded) -> [B, T, C] (VALID)."""
        k, c = self.kernel_size, self.features
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, 1, c), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (c,),
                       self.param_dtype)
        h = h.astype(self.dtype)
        w = w.astype(self.dtype)
        t_out = h.shape[1] - k + 1
        out = h[:, :t_out] * w[0, 0]
        for i in range(1, k):
            out = out + h[:, i:i + t_out] * w[i, 0]
        return out + b.astype(self.dtype)


class ConvModule(nn.Module):
    """Pointwise-GLU -> depthwise conv -> LN -> swish -> pointwise.

    Padded frames are zeroed on entry so the depthwise window only ever
    mixes real frames with exact zeros — outputs are invariant to the
    bucket's pad width. causal=True pads left only (streaming finality).
    """
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.pw1 = nn.Dense(2 * c.d_model, dtype=c.dtype,
                            param_dtype=c.param_dtype)
        self.depthwise = DepthwiseConv1d(
            c.d_model, c.conv_kernel, dtype=c.dtype,
            param_dtype=c.param_dtype)
        self.norm = nn.LayerNorm(dtype=c.dtype)
        self.pw2 = nn.Dense(c.d_model, dtype=c.dtype,
                            param_dtype=c.param_dtype)
        self.drop = nn.Dropout(c.dropout)

    def _glu(self, x):
        a, b = jnp.split(self.pw1(x), 2, axis=-1)
        return a * jax.nn.sigmoid(b)

    def _tail(self, h, deterministic):
        h = nn.swish(self.norm(h))
        h = self.pw2(h)
        return self.drop(h, deterministic=deterministic)

    def __call__(self, x, valid, deterministic: bool = True):
        c = self.cfg
        x = jnp.where(valid[..., None], x, 0.0)
        h = jnp.where(valid[..., None], self._glu(x), 0.0)
        kern = c.conv_kernel
        causal = c.enc_chunk_size > 0
        pad = (kern - 1, 0) if causal else ((kern - 1) // 2, kern // 2)
        h = jnp.pad(h, ((0, 0), pad, (0, 0)))
        h = self.depthwise(h)
        return self._tail(h, deterministic)

    def step(self, x_chunk, conv_cache):
        """Streaming step (causal conv): x_chunk [B, C, D];
        conv_cache [B, kernel-1, D] holds the previous post-GLU frames
        (zeros at stream start == the offline left zero-padding).
        Returns (out [B, C, D], new conv_cache)."""
        h = self._glu(x_chunk)
        ext = jnp.concatenate([conv_cache, h], axis=1)   # [B, K-1+C, D]
        out = self.depthwise(ext)                         # VALID -> [B, C, D]
        new_cache = ext[:, -(self.cfg.conv_kernel - 1):]
        return self._tail(out, True), new_cache


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

    def step(self, x_chunk, pos, k_cache, v_cache, conv_cache, bias):
        """Streaming chunk step (causal conv + cached rel-pos attention);
        mirrors __call__ exactly for valid frames. x_chunk [B, C, D]."""
        x = x_chunk + 0.5 * self.ffn1(self.norm_ffn1(x_chunk))
        h, k_cache, v_cache = self.slf_attn.step(
            self.norm_attn(x), pos, k_cache, v_cache, bias)
        x = x + h
        h, conv_cache = self.conv.step(self.norm_conv(x), conv_cache)
        x = x + h
        x = x + 0.5 * self.ffn2(self.norm_ffn2(x))
        return self.norm_out(x), k_cache, v_cache, conv_cache
