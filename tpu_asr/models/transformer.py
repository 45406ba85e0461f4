"""Model glue: encoder + decoder + CTC head, and the joint objectives.

Reference: src/transformer/transformer.py (`Transformer.forward` ->
(pred, gold)), the CTC model wrapper (src/models/ctc*.py), and the hybrid
CTC/attention objective L = l*L_ctc + (1-l)*L_att selected by the mtlalpha
flag in src/bin/train.py. One flax module covers model_type in
{transformer, ctc, hybrid}; CIF lives in tpu_asr.models.cif.

The forward returns a dict of losses/metrics so the train step stays a
single jit-compiled function with no host round-trips.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from tpu_asr import IGNORE_ID
from tpu_asr.models.config import ModelConfig
from tpu_asr.models.decoder import Decoder
from tpu_asr.models.encoder import Encoder
from tpu_asr.ops.ctc import ctc_loss
from tpu_asr.ops.losses import (label_smoothing_loss, masked_row_mean,
                                token_accuracy)


def add_sos_eos(targets: jnp.ndarray, target_lengths: jnp.ndarray,
                sos_id: int, eos_id: int, ignore_id: int = IGNORE_ID):
    """[B, U] IGNORE-padded targets -> (ys_in [B, U+1], ys_out [B, U+1]).

    Reference: `Decoder.preprocess` — ys_in = <sos> + targets (pad with eos
    so the embedding sees a real id), ys_out = targets + <eos> (pad with
    IGNORE_ID so the loss skips it).
    """
    b, u = targets.shape
    safe = jnp.where(targets == ignore_id, eos_id, targets)
    ys_in = jnp.concatenate(
        [jnp.full((b, 1), sos_id, targets.dtype), safe], axis=1)
    base = jnp.concatenate(
        [targets, jnp.full((b, 1), ignore_id, targets.dtype)], axis=1)
    pos = jnp.arange(u + 1)[None, :]
    ys_out = jnp.where(pos == target_lengths[:, None], eos_id, base)
    return ys_in, ys_out


class CTCHead(nn.Module):
    """Linear d_model -> vocab on encoder output (reference: CTC class)."""
    vocab_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_out):
        return nn.Dense(self.vocab_size, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="ctc_proj")(enc_out)


class Transformer(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.encoder = Encoder(c)
        self.has_decoder = c.model_type in ("transformer", "hybrid")
        self.has_ctc = c.model_type in ("ctc", "hybrid")
        if self.has_decoder:
            self.decoder = Decoder(c)
        if self.has_ctc:
            self.ctc_head = CTCHead(c.vocab_size, c.dtype, c.param_dtype)

    @property
    def sos_id(self):
        return self.cfg.vocab_size - 2

    @property
    def eos_id(self):
        return self.cfg.vocab_size - 1

    def encode(self, feats, feat_lengths, deterministic: bool = True):
        return self.encoder(feats, feat_lengths, deterministic=deterministic)

    def ctc_logits(self, enc_out):
        return self.ctc_head(enc_out)

    def decode_logits(self, enc_out, enc_lengths, ys_in,
                      deterministic: bool = True):
        return self.decoder(enc_out, enc_lengths, ys_in,
                            deterministic=deterministic)

    def __call__(self, feats, feat_lengths, targets, target_lengths,
                 deterministic: bool = True):
        """Returns dict(loss, loss_att, loss_ctc, acc, ...) — all scalars."""
        c = self.cfg
        enc_out, enc_lengths = self.encode(feats, feat_lengths, deterministic)
        # rows padded in by the static-batch loader (feat_lengths == 0)
        # carry no loss; with no dummy rows these reductions are identical
        # to plain mean / mean_label.
        row_valid = feat_lengths > 0
        out = {}
        loss = 0.0
        if self.has_decoder:
            ys_in, ys_out = add_sos_eos(
                targets, target_lengths, self.sos_id, self.eos_id)
            ys_out = jnp.where(row_valid[:, None], ys_out, IGNORE_ID)
            logits = self.decode_logits(enc_out, enc_lengths, ys_in,
                                        deterministic)
            loss_att, n_tok = label_smoothing_loss(
                logits, ys_out, c.label_smoothing)
            out["loss_att"] = loss_att
            out["acc"] = token_accuracy(logits, ys_out)
            loss = loss_att
        if self.has_ctc:
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
            if self.has_decoder:
                lam = c.ctc_weight
                loss = lam * loss_ctc + (1.0 - lam) * loss
            else:
                loss = loss_ctc
        out["loss"] = loss
        return out
