"""Transformer-Transducer (RNN-T) model — beyond-reference family.

The reference covers CTC / attention / hybrid / CIF (SURVEY.md section 2);
the transducer (Graves, arXiv:1211.3711; Transformer-Transducer,
arXiv:2002.02562 via PAPERS.md) completes the standard streaming-ASR
objective set. It reuses this repo's encoder unchanged — including the
chunk-masked streaming mode (enc_chunk_size) — and adds:

* Predictor: a causal-transformer label-history network built from the LM
  layer (models/lm.py LMLayer = masked self-attn + FFN, post-norm), with
  the same explicitly functional cached ``step`` API as the decoder, here
  with PER-ROW positions (each batch row is at its own label count during
  frame-synchronous decoding, so cache appends are batched scatters rather
  than a shared dynamic_update_slice).

* Joint: logits = W_out tanh(W_enc h_t + W_pred g_u) — the output
  projection is held as raw params (not nn.Dense) because the loss
  (ops/transducer.py) applies it per frame INSIDE the lattice scan, which
  is what keeps training memory at O(U*V) instead of O(T*U*V).

* Optional auxiliary CTC head on the encoder (ctc_weight > 0):
  L = w * L_ctc + (1-w) * L_rnnt, the standard transducer convergence aid;
  it also gives transducer checkpoints the frame-synchronous greedy/beam
  CTC decode modes for free.

Interface matches models/transformer.py: __call__(feats, feat_lengths,
targets, target_lengths) -> dict of scalar losses, so the Solver, the
bucketed loaders, SpecAugment, checkpoints and the mesh path all apply
unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_asr import IGNORE_ID
from tpu_asr.models.attention import mask_to_bias
from tpu_asr.models.config import ModelConfig
from tpu_asr.models.encoder import Encoder
from tpu_asr.models.lm import LMConfig, LMLayer
from tpu_asr.models.modules import PositionalEncoding, sinusoid_table
from tpu_asr.models.transformer import CTCHead
from tpu_asr.ops.losses import masked_row_mean
from tpu_asr.ops.transducer import transducer_loss


def _pred_lm_config(c: ModelConfig) -> LMConfig:
    return LMConfig(vocab_size=c.vocab_size, d_model=c.d_model,
                    d_inner=c.d_inner, num_heads=c.num_heads,
                    num_layers=c.num_pred_layers, dropout=c.dropout,
                    pe_maxlen=c.pe_maxlen, dtype=c.dtype,
                    param_dtype=c.param_dtype)


class Predictor(nn.Module):
    """Causal label-history network: embed + PE + N LM layers."""
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        lc = _pred_lm_config(c)
        self.embed = nn.Embed(c.vocab_size, c.d_model,
                              dtype=c.dtype, param_dtype=c.param_dtype)
        self.pe = PositionalEncoding(c.d_model, c.pe_maxlen, c.dtype)
        self.dropout = nn.Dropout(c.dropout)
        self.layers = [LMLayer(lc, name=f"layer_{i}")
                       for i in range(c.num_pred_layers)]

    def _embed_scale(self):
        return (jnp.asarray(self.cfg.d_model, jnp.float32) ** 0.5).astype(
            self.cfg.dtype)

    def __call__(self, ys_in, deterministic: bool = True):
        """ys_in [B, U1] (row u = history token at position u, sos at 0)
        -> hidden states [B, U1, D]."""
        c = self.cfg
        u1 = ys_in.shape[1]
        y = self.dropout(self.pe(self.embed(ys_in) * self._embed_scale()),
                         deterministic=deterministic)
        causal = (jnp.arange(u1)[None, :] <= jnp.arange(u1)[:, None])
        self_bias = mask_to_bias(causal[None, None], c.dtype)
        for layer in self.layers:
            y = layer(y, self_bias, deterministic=deterministic)
        return y

    # ---- functional decode-step API (per-row positions) ----

    def init_cache(self, batch: int, u_max: int):
        c = self.cfg
        zeros = jnp.zeros((batch, u_max, c.num_heads, c.d_head), c.dtype)
        return {f"layer_{i}": {"k": zeros, "v": zeros}
                for i in range(c.num_pred_layers)}

    def step(self, y_prev, pos, cache):
        """One step with PER-ROW positions.

        y_prev [B] token ids, each placed at its row's position pos [B]
        (sos lives at 0); returns (hidden [B, D], new cache). Cache writes
        are batched scatters (cache.at[row, pos_row]); the self-attention
        mask admits positions <= pos per row.
        """
        c = self.cfg
        b = y_prev.shape[0]
        u_max = cache["layer_0"]["k"].shape[1]
        table = jnp.asarray(sinusoid_table(c.pe_maxlen, c.d_model))
        pe = jnp.take(table, pos, axis=0)[:, None, :].astype(c.dtype)
        y = self.embed(y_prev[:, None]) * self._embed_scale() + pe
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
        return y[:, 0], new_cache


class TransducerModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.encoder = Encoder(c)
        self.predictor = Predictor(c)
        self.enc_proj = nn.Dense(c.d_joint, dtype=c.dtype,
                                 param_dtype=c.param_dtype, name="enc_proj")
        self.pred_proj = nn.Dense(c.d_joint, dtype=c.dtype,
                                  param_dtype=c.param_dtype,
                                  name="pred_proj")
        self.joint_w = self.param(
            "joint_out_kernel", nn.initializers.lecun_normal(),
            (c.d_joint, c.vocab_size), c.param_dtype)
        self.joint_b = self.param(
            "joint_out_bias", nn.initializers.zeros,
            (c.vocab_size,), c.param_dtype)
        self.has_ctc = c.ctc_weight > 0.0
        if self.has_ctc:
            self.ctc_head = CTCHead(c.vocab_size, c.dtype, c.param_dtype)

    @property
    def sos_id(self):
        return self.cfg.vocab_size - 2

    @property
    def blank_id(self):
        return 0

    # ---- pieces reused by decode (tpu_asr.decode.transducer_decode) ----

    def encode(self, feats, feat_lengths, deterministic: bool = True):
        return self.encoder(feats, feat_lengths, deterministic=deterministic)

    def enc_features(self, enc_out):
        """Encoder-side joint projection f [B, T, d_joint]."""
        return self.enc_proj(enc_out)

    def ctc_logits(self, enc_out):
        return self.ctc_head(enc_out)

    def predict_sequence(self, ys_in, deterministic: bool = True):
        """Predictor-side joint projections g [B, U1, d_joint]."""
        return self.pred_proj(self.predictor(ys_in, deterministic))

    def predictor_init_cache(self, batch: int, u_max: int):
        return self.predictor.init_cache(batch, u_max)

    def predictor_step(self, y_prev, pos, cache):
        """(tokens [B], per-row pos [B], cache) -> (g [B, d_joint], cache)."""
        h, cache = self.predictor.step(y_prev, pos, cache)
        return self.pred_proj(h[:, None])[:, 0], cache

    def joint_step(self, f_t, g):
        """One frame x one history per row: ([B, dj], [B, dj]) -> [B, V]."""
        joint = jnp.tanh(f_t + g)
        w = self.joint_w.astype(self.cfg.dtype)
        return (joint @ w + self.joint_b).astype(jnp.float32)

    # ---- training ----

    def __call__(self, feats, feat_lengths, targets, target_lengths,
                 deterministic: bool = True):
        c = self.cfg
        enc_out, enc_lengths = self.encode(feats, feat_lengths,
                                           deterministic)
        row_valid = feat_lengths > 0
        safe_targets = jnp.where(targets == IGNORE_ID, 0, targets)
        ys_in = jnp.concatenate(
            [jnp.full((targets.shape[0], 1), self.sos_id, targets.dtype),
             safe_targets], axis=1)                          # [B, U+1]
        f = self.enc_features(enc_out)
        g = self.predict_sequence(ys_in, deterministic)
        nll = transducer_loss(
            f, g, self.joint_w.astype(c.dtype),
            self.joint_b.astype(jnp.float32), safe_targets,
            jnp.where(row_valid, enc_lengths, 0), target_lengths,
            blank=self.blank_id, reduction="none")
        loss_rnnt = masked_row_mean(
            nll / jnp.maximum(target_lengths, 1), row_valid)
        out = {"loss_rnnt": loss_rnnt}
        loss = loss_rnnt
        if self.has_ctc:
            from tpu_asr.ops.ctc import ctc_loss
            ctc_lg = self.ctc_logits(enc_out)
            if c.ctc_pallas:
                from tpu_asr.ops.pallas.ctc import ctc_loss_pallas
                ctc_nll = ctc_loss_pallas(ctc_lg, safe_targets, enc_lengths,
                                          target_lengths, blank=0,
                                          reduction="none")
            else:
                ctc_nll = ctc_loss(ctc_lg, safe_targets, enc_lengths,
                                   target_lengths, blank=0,
                                   reduction="none")
            loss_ctc = masked_row_mean(
                ctc_nll / jnp.maximum(target_lengths, 1), row_valid)
            out["loss_ctc"] = loss_ctc
            loss = c.ctc_weight * loss_ctc + (1.0 - c.ctc_weight) * loss
        out["loss"] = loss
        return out
