"""Transformer encoder with conv2d-subsampling (or LFR+linear) input layer.

Reference: src/transformer/encoder.py (`Encoder`, `EncoderLayer`,
`get_non_pad_mask`/`get_attn_pad_mask`): input Linear+LayerNorm, sinusoidal
PE, N=6 post-norm layers of self-attention + position-wise FFN. The conv2d
front-end is the eastonYi addition (src/models/conv_encoder.py style).

TPU shape discipline: everything takes statically padded [B, T, D] and a
lengths vector; padding positions are masked in attention via an additive
bias and zeroed at the output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_asr.models.attention import MultiHeadAttention, mask_to_bias
from tpu_asr.models.config import ModelConfig
from tpu_asr.models.conv import Conv2dSubsampling
from tpu_asr.models.modules import (PositionalEncoding,
                                    PositionwiseFeedForward, PostNormBlock)
from tpu_asr.utils.padding import make_valid_mask


class EncoderLayer(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.slf_attn = MultiHeadAttention(
            c.num_heads, c.d_model, c.dropout, c.dtype, c.param_dtype,
            use_pallas=c.attention_pallas)
        self.ffn = PositionwiseFeedForward(
            c.d_model, c.d_inner, c.dropout, c.dtype, c.param_dtype)
        self.post_attn = PostNormBlock(c.d_model, c.dropout, c.dtype,
                                      use_pallas=c.layernorm_pallas)
        self.post_ffn = PostNormBlock(c.d_model, c.dropout, c.dtype,
                                      use_pallas=c.layernorm_pallas)

    def __call__(self, x, bias, deterministic: bool = True):
        h = self.slf_attn(x, x, bias, deterministic=deterministic)
        x = self.post_attn(x, h, deterministic=deterministic)
        h = self.ffn(x, deterministic=deterministic)
        return self.post_ffn(x, h, deterministic=deterministic)

    def step(self, x_t, pos, k_self, v_self, self_bias):
        """Cached causal step (used by the CIF decoder's compiled decode).

        x_t: [B, 1, D]; k_self/v_self: [B, U_max, H, dh] caches.
        """
        k_t, v_t = self.slf_attn.project_kv_step(x_t)
        k_self = jax.lax.dynamic_update_slice_in_dim(k_self, k_t, pos, axis=1)
        v_self = jax.lax.dynamic_update_slice_in_dim(v_self, v_t, pos, axis=1)
        h = self.slf_attn.step(x_t, k_self, v_self, self_bias)
        x = self.post_attn(x_t, h)
        h = self.ffn(x)
        return self.post_ffn(x, h), k_self, v_self


class Encoder(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        if c.input_layer == "conv2d":
            self.subsample = Conv2dSubsampling(
                c.d_model, channels=c.conv_channels, dtype=c.dtype,
                param_dtype=c.param_dtype)
        elif c.input_layer == "linear":
            self.linear_in = nn.Dense(c.d_model, dtype=c.dtype,
                                      param_dtype=c.param_dtype)
            self.norm_in = nn.LayerNorm(dtype=c.dtype)
        else:
            raise ValueError(f"unknown input_layer {c.input_layer!r}")
        self.pe = PositionalEncoding(c.d_model, c.pe_maxlen, c.dtype)
        self.dropout = nn.Dropout(c.dropout)
        self.layers = [EncoderLayer(c, name=f"layer_{i}")
                       for i in range(c.num_enc_layers)]

    def __call__(self, feats, feat_lengths, deterministic: bool = True):
        """[B, T, D_in] + [B] -> ([B, T', d_model], [B] lengths)."""
        c = self.cfg
        if c.input_layer == "conv2d":
            x, out_lengths = self.subsample(feats, feat_lengths)
        else:
            x = self.norm_in(self.linear_in(feats))
            out_lengths = feat_lengths
        x = self.dropout(self.pe(x), deterministic=deterministic)
        t = x.shape[1]
        valid = make_valid_mask(out_lengths, t)                 # [B, T']
        if c.enc_chunk_size > 0:
            # streaming chunk mask: frame q attends to frames in chunks
            # <= chunk(q) (and >= chunk(q) - enc_left_chunks when left
            # context is bounded) — identical at train and decode time, so
            # incremental decoding reproduces offline outputs exactly.
            cid = jnp.arange(t) // c.enc_chunk_size
            allow = cid[:, None] >= cid[None, :]                # [T', T']
            if c.enc_left_chunks >= 0:
                allow &= (cid[:, None] - cid[None, :]) <= c.enc_left_chunks
            mask = valid[:, None, None, :] & allow[None, None]  # [B,1,T',T']
            bias = mask_to_bias(mask, c.dtype)
        else:
            bias = mask_to_bias(valid[:, None, None, :], c.dtype)  # [B,1,1,T']
        for layer in self.layers:
            x = layer(x, bias, deterministic=deterministic)
        x = jnp.where(valid[..., None], x, 0.0)
        return x, out_lengths
