"""CIF model: assigner + integrate-and-fire + autoregressive decoder.

Reference: src/models/assigner.py + src/models/cif_model.py (medium
confidence names, SURVEY.md section 2.1) implementing Dong & Xu's CIF
(arXiv:1905.11235): a small conv net over encoder output emits per-frame
weights alpha = sigmoid(.); weighted accumulation fires one embedding per
output token; training scales alpha so the fire count equals the target
length and adds the quantity loss |sum(alpha) - U|.

TPU design: the fire scan is the parallel overlap-matmul from
tpu_asr.ops.cif (no sequential loop); the decoder is a causal self-attention
stack over `embed(prev_token) + W @ fired[u]` (additive fusion), so both
training and the compiled decode loop stay MXU-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_asr import IGNORE_ID
from tpu_asr.models.attention import mask_to_bias
from tpu_asr.models.config import ModelConfig
from tpu_asr.models.encoder import Encoder, EncoderLayer
from tpu_asr.models.modules import PositionalEncoding
from tpu_asr.models.transformer import CTCHead, add_sos_eos
from tpu_asr.ops.cif import (cif_fire, fire_count, quantity_loss,
                             scale_alphas)
from tpu_asr.ops.ctc import ctc_loss
from tpu_asr.ops.losses import (label_smoothing_loss, masked_row_mean,
                                token_accuracy)
from tpu_asr.utils.padding import make_causal_mask, make_valid_mask


# Width of the assigner's SAME conv: alpha_j reads encoder frames
# [j - ASSIGNER_LOOKAHEAD, j + ASSIGNER_LOOKAHEAD]. Streaming finality
# bookkeeping (decode/streaming.py) derives its halo-window size and
# final-frame horizon from these — keep them in sync with the Conv below.
ASSIGNER_CONV_WIDTH = 3
ASSIGNER_LOOKAHEAD = (ASSIGNER_CONV_WIDTH - 1) // 2


class Assigner(nn.Module):
    """Per-frame fire weights: conv over encoder output -> sigmoid scalar."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, enc_out, enc_lengths):
        c = self.cfg
        h = nn.Conv(c.d_model, (ASSIGNER_CONV_WIDTH,), padding="SAME",
                    dtype=c.dtype,
                    param_dtype=c.param_dtype, name="conv")(enc_out)
        h = nn.relu(h)
        alphas = nn.sigmoid(
            nn.Dense(1, dtype=c.dtype, param_dtype=c.param_dtype,
                     name="proj")(h))[..., 0]                     # [B, T]
        valid = make_valid_mask(enc_lengths, alphas.shape[1])
        return jnp.where(valid, alphas.astype(jnp.float32), 0.0), valid


class CifDecoder(nn.Module):
    """Causal self-attention decoder over fused (token, fired) inputs."""
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(c.vocab_size, c.d_model, dtype=c.dtype,
                              param_dtype=c.param_dtype)
        self.fuse = nn.Dense(c.d_model, dtype=c.dtype,
                             param_dtype=c.param_dtype)
        self.pe = PositionalEncoding(c.d_model, c.pe_maxlen, c.dtype)
        self.dropout = nn.Dropout(c.dropout)
        # causal self-attn + FFN blocks (EncoderLayer with a causal bias)
        self.layers = [EncoderLayer(c, name=f"layer_{i}")
                       for i in range(c.num_dec_layers)]

    def _fused_input(self, ys_in, fired, deterministic):
        c = self.cfg
        scale = (jnp.asarray(c.d_model, jnp.float32) ** 0.5).astype(c.dtype)
        y = self.embed(ys_in) * scale + self.fuse(fired.astype(c.dtype))
        return self.dropout(self.pe(y), deterministic=deterministic)

    def _project_out(self, y):
        if self.cfg.tie_embedding:
            return self.embed.attend(y)
        return nn.Dense(self.cfg.vocab_size, use_bias=False,
                        dtype=self.cfg.dtype,
                        param_dtype=self.cfg.param_dtype,
                        name="out_proj")(y)

    def __call__(self, ys_in, fired, deterministic: bool = True):
        """ys_in [B, U], fired [B, U, D] -> logits [B, U, V]."""
        y = self._fused_input(ys_in, fired, deterministic)
        bias = mask_to_bias(make_causal_mask(ys_in.shape[1])[None, None],
                            self.cfg.dtype)
        for layer in self.layers:
            y = layer(y, bias, deterministic=deterministic)
        return self._project_out(y)

    # ---- functional decode-step API (used by tpu_asr.decode) ----

    def init_cache(self, batch: int, u_max: int):
        c = self.cfg
        zeros = jnp.zeros((batch, u_max, c.num_heads, c.d_head), c.dtype)
        return {f"layer_{i}": {"k": zeros, "v": zeros}
                for i in range(c.num_dec_layers)}

    def step(self, y_prev, fired_t, pos, cache):
        """One decode position: y_prev [B] token ids, fired_t [B, D] the
        fired embedding for this position. Returns (logits [B, V], cache)."""
        c = self.cfg
        u_max = cache["layer_0"]["k"].shape[1]
        scale = (jnp.asarray(c.d_model, jnp.float32) ** 0.5).astype(c.dtype)
        y = (self.embed(y_prev[:, None]) * scale
             + self.fuse(fired_t[:, None].astype(c.dtype)))
        y = self.pe(y, offset=pos)
        allowed = (jnp.arange(u_max) <= pos)[None, None, None, :]
        bias = mask_to_bias(allowed, c.dtype)
        new_cache = {}
        for i, layer in enumerate(self.layers):
            key = f"layer_{i}"
            y, k, v = layer.step(y, pos, cache[key]["k"], cache[key]["v"],
                                 bias)
            new_cache[key] = {"k": k, "v": v}
        return self._project_out(y)[:, 0], new_cache


class CifModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.encoder = Encoder(c)
        self.assigner = Assigner(c)
        self.decoder = CifDecoder(c)
        self.use_ctc = c.ctc_weight > 0.0
        if self.use_ctc:
            self.ctc_head = CTCHead(c.vocab_size, c.dtype, c.param_dtype)

    @property
    def sos_id(self):
        return self.cfg.vocab_size - 2

    @property
    def eos_id(self):
        return self.cfg.vocab_size - 1

    def encode(self, feats, feat_lengths, deterministic: bool = True):
        enc_out, enc_lengths = self.encoder(feats, feat_lengths,
                                            deterministic=deterministic)
        alphas, valid = self.assigner(enc_out, enc_lengths)
        return enc_out, enc_lengths, alphas, valid

    def fire(self, enc_out, alphas, u_max):
        if self.cfg.cif_pallas:
            from tpu_asr.ops.pallas.cif import cif_fire_pallas
            return cif_fire_pallas(enc_out, alphas, u_max)
        return cif_fire(enc_out.astype(jnp.float32), alphas, u_max)

    def decode_logits(self, ys_in, fired, deterministic: bool = True):
        return self.decoder(ys_in, fired, deterministic=deterministic)

    def ctc_logits(self, enc_out):
        return self.ctc_head(enc_out)

    def __call__(self, feats, feat_lengths, targets, target_lengths,
                 deterministic: bool = True):
        c = self.cfg
        enc_out, enc_lengths, alphas, valid = self.encode(
            feats, feat_lengths, deterministic)
        # dummy rows from the static-batch loader carry no loss
        row_valid = feat_lengths > 0
        # Quantity loss on UNSCALED alphas; teacher-forced fire count. The
        # target includes the <eos> fire (U+1 fires: one per output token).
        u_fire = target_lengths + 1
        loss_qty = quantity_loss(alphas, valid, u_fire, row_valid=row_valid)
        scaled = scale_alphas(alphas, valid, u_fire)
        ys_in, ys_out = add_sos_eos(targets, target_lengths,
                                    self.sos_id, self.eos_id)
        ys_out = jnp.where(row_valid[:, None], ys_out, IGNORE_ID)
        fired = self.fire(enc_out, scaled, ys_in.shape[1])       # [B,U+1,D]
        logits = self.decode_logits(ys_in, fired, deterministic)
        loss_att, _ = label_smoothing_loss(logits, ys_out, c.label_smoothing)
        out = {"loss_att": loss_att, "loss_qty": loss_qty,
               "acc": token_accuracy(logits, ys_out)}
        loss = loss_att + c.cif_quantity_weight * loss_qty
        if self.use_ctc:
            ctc_lg = self.ctc_logits(enc_out)
            safe_targets = jnp.where(targets == IGNORE_ID, 0, targets)
            if c.ctc_pallas:
                from tpu_asr.ops.pallas.ctc import ctc_loss_pallas
                nll = ctc_loss_pallas(ctc_lg, safe_targets, enc_lengths,
                                      target_lengths, blank=0,
                                      reduction="none")
            else:
                nll = ctc_loss(ctc_lg, safe_targets, enc_lengths,
                               target_lengths, blank=0, reduction="none")
            loss_ctc = masked_row_mean(
                nll / jnp.maximum(target_lengths, 1), row_valid)
            out["loss_ctc"] = loss_ctc
            loss = loss + c.ctc_weight * loss_ctc
        out["loss"] = loss
        return out
