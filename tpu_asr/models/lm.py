"""Transformer language model for shallow fusion and n-best rescoring.

Beyond-reference capability: the reference's recognize path
(src/bin/recognize.py -> Decoder.recognize_beam) scores hypotheses with
the acoustic decoder only; the espnet family it descends from standardly
fuses an external character LM into the beam (score += lm_weight *
log P_lm). We provide that: a decoder-only transformer trained on
transcripts (bin/train_lm.py) that plugs into

  * attention/joint beam search (decode/beam.py, shallow fusion — the LM
    advances inside the same compiled lax.scan via the cached ``step``
    API, mirroring models/decoder.py), and
  * attention rescoring (decode/rescore.py, one extra teacher-forced
    LM pass over the n-best).

TPU-first: identical static-shape discipline as the ASR decoder — the
whole fused search stays one XLA program; the LM's self-attention K/V
caches are plain arrays threaded through the scan carry and reordered
with the same one-hot MXU beam gather as the decoder caches.

Token convention matches the ASR model: ids [0, vocab) with
sos = vocab-2 and eos = vocab-1; an LM sequence is scored as
P(y_1 .. y_U, eos | sos).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_asr.models.attention import MultiHeadAttention, mask_to_bias
from tpu_asr.models.modules import (PositionalEncoding,
                                    PositionwiseFeedForward, PostNormBlock)
from tpu_asr.utils.padding import make_causal_mask


@dataclasses.dataclass(frozen=True)
class LMConfig:
    vocab_size: int = 4233
    d_model: int = 256
    d_inner: int = 1024
    num_heads: int = 4
    num_layers: int = 4
    dropout: float = 0.1
    pe_maxlen: int = 5000
    tie_embedding: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def d_head(self) -> int:
        assert self.d_model % self.num_heads == 0
        return self.d_model // self.num_heads


class LMLayer(nn.Module):
    """Masked self-attention + FFN with post-norm residuals (the ASR
    DecoderLayer minus cross-attention)."""
    cfg: LMConfig

    def setup(self):
        c = self.cfg
        self.slf_attn = MultiHeadAttention(
            c.num_heads, c.d_model, c.dropout, c.dtype, c.param_dtype)
        self.ffn = PositionwiseFeedForward(
            c.d_model, c.d_inner, c.dropout, c.dtype, c.param_dtype)
        self.post_slf = PostNormBlock(c.d_model, c.dropout, c.dtype)
        self.post_ffn = PostNormBlock(c.d_model, c.dropout, c.dtype)

    def __call__(self, y, self_bias, deterministic: bool = True):
        h = self.slf_attn(y, y, self_bias, deterministic=deterministic)
        y = self.post_slf(y, h, deterministic=deterministic)
        h = self.ffn(y, deterministic=deterministic)
        return self.post_ffn(y, h, deterministic=deterministic)

    def step(self, y_t, pos, k_self, v_self, self_bias):
        """One position with explicit caches (models/decoder.py shape
        conventions: y_t [B,1,D], k/v [B,U_max,H,dh] updated at pos)."""
        k_t, v_t = self.slf_attn.project_kv_step(y_t)
        k_self = jax.lax.dynamic_update_slice_in_dim(k_self, k_t, pos, axis=1)
        v_self = jax.lax.dynamic_update_slice_in_dim(v_self, v_t, pos, axis=1)
        h = self.slf_attn.step(y_t, k_self, v_self, self_bias)
        y = self.post_slf(y_t, h)
        h = self.ffn(y)
        return self.post_ffn(y, h), k_self, v_self


class TransformerLM(nn.Module):
    cfg: LMConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(c.vocab_size, c.d_model,
                              dtype=c.dtype, param_dtype=c.param_dtype)
        self.pe = PositionalEncoding(c.d_model, c.pe_maxlen, c.dtype)
        self.dropout = nn.Dropout(c.dropout)
        self.layers = [LMLayer(c, name=f"layer_{i}")
                       for i in range(c.num_layers)]
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

    def __call__(self, ys_in, deterministic: bool = True):
        """Teacher-forced: ys_in [B, U] -> logits [B, U, V] where
        logits[:, j] predicts the token following ys_in[:, j]."""
        u = ys_in.shape[1]
        y = self._embed_in(ys_in, deterministic)
        causal = make_causal_mask(u)[None, None]                 # [1,1,U,U]
        self_bias = mask_to_bias(causal, self.cfg.dtype)
        for layer in self.layers:
            y = layer(y, self_bias, deterministic=deterministic)
        return self._project_out(y)

    # ---- functional decode-step API (used by tpu_asr.decode) ----

    def init_cache(self, batch: int, u_max: int):
        c = self.cfg
        shape = (batch, u_max, c.num_heads, c.d_head)
        zeros = jnp.zeros(shape, c.dtype)
        return {f"layer_{i}": {"k": zeros, "v": zeros}
                for i in range(c.num_layers)}

    def step(self, y_prev, pos, cache):
        """One step: y_prev [B] token ids at position pos (0-based) ->
        (logits [B, V] for the NEXT token, new cache)."""
        c = self.cfg
        u_max = cache["layer_0"]["k"].shape[1]
        y = self._embed_in(y_prev[:, None], True, offset=pos)    # [B,1,D]
        allowed = (jnp.arange(u_max) <= pos)[None, None, None, :]
        self_bias = mask_to_bias(allowed, c.dtype)
        new_cache = {}
        for i, layer in enumerate(self.layers):
            key = f"layer_{i}"
            y, k_self, v_self = layer.step(
                y, pos, cache[key]["k"], cache[key]["v"], self_bias)
            new_cache[key] = {"k": k_self, "v": v_self}
        logits = self._project_out(y)[:, 0]                      # [B, V]
        return logits, new_cache

    def step_at(self, y_prev, pos, cache):
        """Like ``step`` but with PER-ROW positions pos [B] — required by
        alignment-synchronous searches (transducer ALSD fusion) where each
        beam row is at its own history length. Cache appends are batched
        scatters; the mask admits positions <= pos per row. Equals ``step``
        when all rows share one position (tested)."""
        c = self.cfg
        b = y_prev.shape[0]
        u_max = cache["layer_0"]["k"].shape[1]
        from tpu_asr.models.modules import sinusoid_table
        table = jnp.asarray(sinusoid_table(c.pe_maxlen, c.d_model))
        scale = (jnp.asarray(c.d_model, jnp.float32) ** 0.5).astype(c.dtype)
        pe = jnp.take(table, pos, axis=0)[:, None, :].astype(c.dtype)
        y = self.embed(y_prev[:, None]) * scale + pe
        allowed = (jnp.arange(u_max)[None, :] <= pos[:, None])
        self_bias = mask_to_bias(allowed[:, None, None, :], c.dtype)
        rows = jnp.arange(b)
        new_cache = {}
        for i, layer in enumerate(self.layers):
            key = f"layer_{i}"
            k_t, v_t = layer.slf_attn.project_kv_step(y)
            k = cache[key]["k"].at[rows, pos].set(k_t[:, 0])
            v = cache[key]["v"].at[rows, pos].set(v_t[:, 0])
            h = layer.slf_attn.step(y, k, v, self_bias)
            y = layer.post_slf(y, h)
            h = layer.ffn(y)
            y = layer.post_ffn(y, h)
            new_cache[key] = {"k": k, "v": v}
        logits = self._project_out(y)[:, 0]
        return logits, new_cache


# ---- config sidecar (parallel to Checkpointer.save_config, which is
# ModelConfig-typed; the LM keeps its own lm_config.json so an LM
# checkpoint dir is self-describing for recognize.py --lm-ckpt) ----

_LM_CONFIG_FILE = "lm_config.json"


def save_lm_config(directory: str, cfg: LMConfig) -> None:
    import numpy as np
    d = dataclasses.asdict(cfg)
    d["dtype"] = np.dtype(cfg.dtype).name
    d["param_dtype"] = np.dtype(cfg.param_dtype).name
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, _LM_CONFIG_FILE), "w") as f:
        json.dump(d, f, indent=2)


def load_lm_config(directory: str) -> LMConfig:
    with open(os.path.join(directory, _LM_CONFIG_FILE)) as f:
        d = json.load(f)
    d["dtype"] = jnp.dtype(d["dtype"])
    d["param_dtype"] = jnp.dtype(d["param_dtype"])
    return LMConfig(**d)
