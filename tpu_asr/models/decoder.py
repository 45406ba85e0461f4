"""Transformer decoder: teacher-forced pass + cached single-step decode.

Reference: src/transformer/decoder.py (`Decoder`, `DecoderLayer`,
`get_subsequent_mask`, `preprocess`): target embedding (optionally tied with
the output projection), sinusoidal PE, N=6 post-norm layers of masked
self-attn + cross-attn + FFN.

The big TPU redesign vs the reference: `recognize_beam` there is a
host-driven python loop, one forward per token per beam. Here the decoder
exposes an explicitly functional cached `step` (self-attn K/V caches are
plain arrays threaded through lax.scan/while_loop by tpu_asr.decode), so the
whole beam search compiles into one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_asr.models.attention import MultiHeadAttention, attend, mask_to_bias
from tpu_asr.models.config import ModelConfig
from tpu_asr.models.modules import (PositionalEncoding,
                                    PositionwiseFeedForward, PostNormBlock,
                                    sinusoid_table)
from tpu_asr.utils.padding import make_valid_mask, make_causal_mask


class DecoderLayer(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.slf_attn = MultiHeadAttention(
            c.num_heads, c.d_model, c.dropout, c.dtype, c.param_dtype,
            use_pallas=c.attention_pallas)
        self.crs_attn = MultiHeadAttention(
            c.num_heads, c.d_model, c.dropout, c.dtype, c.param_dtype,
            use_pallas=c.attention_pallas)
        self.ffn = PositionwiseFeedForward(
            c.d_model, c.d_inner, c.dropout, c.dtype, c.param_dtype)
        self.post_slf = PostNormBlock(c.d_model, c.dropout, c.dtype,
                                      use_pallas=c.layernorm_pallas)
        self.post_crs = PostNormBlock(c.d_model, c.dropout, c.dtype,
                                      use_pallas=c.layernorm_pallas)
        self.post_ffn = PostNormBlock(c.d_model, c.dropout, c.dtype,
                                      use_pallas=c.layernorm_pallas)

    def __call__(self, y, enc, self_bias, cross_bias,
                 deterministic: bool = True):
        h = self.slf_attn(y, y, self_bias, deterministic=deterministic)
        y = self.post_slf(y, h, deterministic=deterministic)
        h = self.crs_attn(y, enc, cross_bias, deterministic=deterministic)
        y = self.post_crs(y, h, deterministic=deterministic)
        h = self.ffn(y, deterministic=deterministic)
        return self.post_ffn(y, h, deterministic=deterministic)

    def step(self, y_t, pos, k_self, v_self, k_cross, v_cross,
             self_bias, cross_bias):
        """One decode position with explicit caches.

        y_t: [B, 1, D]; k_self/v_self: [B, U_max, H, dh] (updated at pos);
        k_cross/v_cross: precomputed [B, T, H, dh].
        """
        k_t, v_t = self.slf_attn.project_kv_step(y_t)
        k_self = jax.lax.dynamic_update_slice_in_dim(k_self, k_t, pos, axis=1)
        v_self = jax.lax.dynamic_update_slice_in_dim(v_self, v_t, pos, axis=1)
        h = self.slf_attn.step(y_t, k_self, v_self, self_bias)
        y = self.post_slf(y_t, h)
        h = self.crs_attn.step(y, k_cross, v_cross, cross_bias)
        y = self.post_crs(y, h)
        h = self.ffn(y)
        return self.post_ffn(y, h), k_self, v_self


class Decoder(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(c.vocab_size, c.d_model,
                              dtype=c.dtype, param_dtype=c.param_dtype)
        self.pe = PositionalEncoding(c.d_model, c.pe_maxlen, c.dtype)
        self.dropout = nn.Dropout(c.dropout)
        self.layers = [DecoderLayer(c, name=f"layer_{i}")
                       for i in range(c.num_dec_layers)]
        if not c.tie_embedding:
            self.out_proj = nn.Dense(c.vocab_size, use_bias=False,
                                     dtype=c.dtype, param_dtype=c.param_dtype)

    def _embed_in(self, ys, deterministic, offset=0):
        c = self.cfg
        scale = jnp.asarray(c.d_model, jnp.float32) ** 0.5
        emb = self.embed(ys) * scale.astype(c.dtype)
        return self.dropout(self.pe(emb, offset=offset),
                            deterministic=deterministic)

    def _project_out(self, y):
        if self.cfg.tie_embedding:
            return self.embed.attend(y)
        return self.out_proj(y)

    def __call__(self, enc_out, enc_lengths, ys_in,
                 deterministic: bool = True):
        """Teacher-forced: enc_out [B,T,D], ys_in [B,U] -> logits [B,U,V]."""
        c = self.cfg
        b, u = ys_in.shape
        t = enc_out.shape[1]
        y = self._embed_in(ys_in, deterministic)
        causal = make_causal_mask(u)[None, None]                 # [1,1,U,U]
        self_bias = mask_to_bias(causal, c.dtype)
        enc_valid = make_valid_mask(enc_lengths, t)              # [B, T]
        cross_bias = mask_to_bias(enc_valid[:, None, None, :], c.dtype)
        for layer in self.layers:
            y = layer(y, enc_out, self_bias, cross_bias,
                      deterministic=deterministic)
        return self._project_out(y)

    # ---- functional decode-step API (used by tpu_asr.decode) ----

    def init_cache(self, batch: int, u_max: int):
        c = self.cfg
        shape = (batch, u_max, c.num_heads, c.d_head)
        zeros = jnp.zeros(shape, c.dtype)
        return {f"layer_{i}": {"k": zeros, "v": zeros}
                for i in range(c.num_dec_layers)}

    def precompute_cross_kv(self, enc_out):
        """Per-layer cross-attention K/V, computed once per utterance."""
        return {f"layer_{i}": dict(zip(("k", "v"),
                                       layer.crs_attn.project_kv(enc_out)))
                for i, layer in enumerate(self.layers)}

    def step(self, y_prev, pos, cache, cross_kv, enc_lengths):
        """One decode step for the whole (flattened) batch/beam.

        y_prev: [B] previous token ids; pos: scalar int (0-based position of
        y_prev in the sequence); returns (logits [B, V], new cache).
        """
        c = self.cfg
        b = y_prev.shape[0]
        u_max = cache["layer_0"]["k"].shape[1]
        t = cross_kv["layer_0"]["k"].shape[1]
        y = self._embed_in(y_prev[:, None], True, offset=pos)    # [B,1,D]
        # self-attn: allow cache positions <= pos
        allowed = (jnp.arange(u_max) <= pos)[None, None, None, :]
        self_bias = mask_to_bias(allowed, c.dtype)
        enc_valid = make_valid_mask(enc_lengths, t)
        cross_bias = mask_to_bias(enc_valid[:, None, None, :], c.dtype)
        new_cache = {}
        for i, layer in enumerate(self.layers):
            key = f"layer_{i}"
            y, k_self, v_self = layer.step(
                y, pos, cache[key]["k"], cache[key]["v"],
                cross_kv[key]["k"], cross_kv[key]["v"],
                self_bias, cross_bias)
            new_cache[key] = {"k": k_self, "v": v_self}
        logits = self._project_out(y)[:, 0]                      # [B, V]
        return logits, new_cache
