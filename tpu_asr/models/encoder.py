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
        if c.encoder_type == "conformer":
            from tpu_asr.models.conformer import ConformerLayer
            self.layers = [ConformerLayer(c, name=f"layer_{i}")
                           for i in range(c.num_enc_layers)]
        else:
            assert c.encoder_type == "transformer", c.encoder_type
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
        conformer = c.encoder_type == "conformer"
        if conformer:
            # relative positions live inside the attention scores; no
            # absolute PE is added to the input (Conformer convention)
            x = self.dropout(x, deterministic=deterministic)
        else:
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
        if conformer:
            from tpu_asr.models.conformer import rel_sinusoid_table
            pos_emb = jnp.asarray(rel_sinusoid_table(t, c.d_model)).astype(
                c.dtype)
            for layer in self.layers:
                x = layer(x, pos_emb, bias, valid,
                          deterministic=deterministic)
        else:
            for layer in self.layers:
                x = layer(x, bias, deterministic=deterministic)
        x = jnp.where(valid[..., None], x, 0.0)
        return x, out_lengths

    # ---- incremental (KV-cached) chunk encoding for streaming ----

    def init_cache(self, batch: int, t_max: int):
        """Per-layer self-attention K/V caches over t_max encoder frames
        (+ a depthwise-conv left-context cache for conformer layers —
        zeros, matching the offline causal conv's left zero-padding)."""
        c = self.cfg
        zeros = jnp.zeros((batch, t_max, c.num_heads, c.d_head), c.dtype)
        caches = {f"layer_{i}": {"k": zeros, "v": zeros}
                  for i in range(c.num_enc_layers)}
        if c.encoder_type == "conformer":
            conv0 = jnp.zeros((batch, c.conv_kernel - 1, c.d_model),
                              c.dtype)
            for entry in caches.values():
                entry["conv"] = conv0
        return caches

    def encode_chunk(self, feat_window, chunk_idx, caches,
                     valid_upto=None):
        """One O(C * T_cached) streaming step: encode chunk `chunk_idx`.

        feat_window: [B, 4C+3, D_in] — the raw frames whose VALID conv
        receptive fields produce exactly the chunk's C post-subsample
        outputs (window start = 4*C*chunk_idx). caches: from init_cache.
        Returns (enc_chunk [B, C, d_model], caches). Output is bitwise
        equal to the corresponding slice of __call__ on the full utterance
        with the same chunk mask: cached K/V rows are what the full pass
        computes (induction over layers), masked rows underflow to exact
        zeros, and every other op is frame-local.
        """
        c = self.cfg
        assert c.input_layer == "conv2d", "chunked encoding needs conv2d"
        chunk = c.enc_chunk_size
        assert chunk > 0, "chunked encoding needs enc_chunk_size > 0"
        assert feat_window.shape[1] == 4 * chunk + 3, feat_window.shape
        t_max = caches["layer_0"]["k"].shape[1]
        x, _ = self.subsample(
            feat_window, jnp.full((feat_window.shape[0],),
                                  feat_window.shape[1], jnp.int32))
        # [B, C, d_model]; global positions [chunk_idx*C, (chunk_idx+1)*C)
        pos = chunk_idx * chunk
        conformer = c.encoder_type == "conformer"
        if not conformer:
            x = self.pe(x, offset=pos)
        idx = jnp.arange(t_max)
        allowed = idx < pos + chunk
        if valid_upto is not None:
            # end-of-stream partial chunk: frames past the true encoder
            # length are conv garbage — exclude them like the offline
            # valid mask does (outputs past valid_upto are not emitted)
            allowed &= idx < valid_upto
        if c.enc_left_chunks >= 0:
            allowed &= idx >= jnp.maximum(
                (chunk_idx - c.enc_left_chunks) * chunk, 0)
        bias = mask_to_bias(allowed[None, None, None, :], c.dtype)
        new_caches = {}
        for i, layer in enumerate(self.layers):
            key = f"layer_{i}"
            if conformer:
                x, k, v, conv = layer.step(
                    x, pos, caches[key]["k"], caches[key]["v"],
                    caches[key]["conv"], bias)
                new_caches[key] = {"k": k, "v": v, "conv": conv}
            else:
                x, k, v = layer.step(x, pos, caches[key]["k"],
                                     caches[key]["v"], bias)
                new_caches[key] = {"k": k, "v": v}
        return x, new_caches
