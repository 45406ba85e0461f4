"""Attention-rescoring decode: CTC prefix beam n-best + ONE teacher-forced
decoder pass.

Beyond-reference decode mode (the reference's recognize path only offers
autoregressive attention/joint beam decoding; rescoring is the standard
two-pass alternative popularized by WeNet's "CTC prefix beam + attention
rescoring"). It is the most TPU-friendly decode shape available: the
autoregressive loop disappears entirely —

  1. frame-synchronous CTC prefix beam search (one lax.scan over frames)
     produces W hypotheses per utterance with CTC scores;
  2. a single teacher-forced decoder forward over all B*W hypotheses at
     once scores every hypothesis in one batched MXU pass (no per-step
     KV-cache reorder, no per-token dispatch);
  3. final score = attention log-prob + ctc_weight * CTC log-prob, best
     hypothesis wins.

Compared to the joint beam at equal W this trades the exact synchronous
search for a rescored CTC n-best — the standard quality/latency trade —
and decodes several times faster (see bench extras).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_asr.decode.ctc_beam import ctc_prefix_beam_search

NEG_INF = -1e30


def attention_rescore(
    decoder,
    dec_params,
    enc_out: jnp.ndarray,
    enc_lengths: jnp.ndarray,
    ctc_logits: jnp.ndarray,
    sos_id: int,
    eos_id: int,
    beam: int = 10,
    max_len: int = 64,
    ctc_weight: float = 0.5,
    ctc_topk: int = 8,
    lm=None,
    lm_params=None,
    lm_weight: float = 0.0,
):
    """-> dict(tokens [B, W, L] (-1-padded), scores [B, W], lengths
    [B, W]) sorted best-first by the combined score.

    decoder/dec_params as in attention_beam_search; ctc_logits [B, T', V]
    raw CTC head logits; ctc_weight weights the CTC score in the final
    ranking (attention score has weight 1, WeNet convention). An optional
    external TransformerLM (models/lm.py) adds lm_weight * logP_lm via
    one more teacher-forced pass over the same n-best — still no
    autoregressive loop anywhere.
    """
    b, t, _ = enc_out.shape
    w = beam
    l = min(max_len, ctc_logits.shape[1])

    toks, lens, ctc_scores = ctc_prefix_beam_search(
        ctc_logits, enc_lengths, beam=w, topk=ctc_topk, max_len=l)
    # [B, W, L] / [B, W] / [B, W]

    n = b * w
    toks_f = toks.reshape(n, l)
    lens_f = lens.reshape(n)
    # teacher-forced input: [sos, y_0 .. y_{L-1}] (pads clipped to eos id
    # for a valid embedding lookup; their positions are masked out below)
    ys_in = jnp.concatenate(
        [jnp.full((n, 1), sos_id, jnp.int32),
         jnp.where(toks_f >= 0, toks_f, eos_id)], axis=1)      # [N, L+1]
    enc_tiled = jnp.repeat(enc_out, w, axis=0)
    el_tiled = jnp.repeat(enc_lengths, w, axis=0)
    logits = decoder.apply(dec_params, enc_tiled, el_tiled, ys_in)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # position j < len scores token j; position j == len scores eos
    pos = jnp.arange(l + 1)[None, :]                           # [1, L+1]
    tgt = jnp.concatenate(
        [jnp.where(toks_f >= 0, toks_f, 0),
         jnp.zeros((n, 1), jnp.int32)], axis=1)
    tgt = jnp.where(pos == lens_f[:, None], eos_id, tgt)       # [N, L+1]
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    att_score = jnp.sum(
        jnp.where(pos <= lens_f[:, None], tok_lp, 0.0), axis=1)  # [N]

    final = att_score.reshape(b, w) + ctc_weight * ctc_scores
    if lm is not None and lm_weight > 0.0:
        lm_logits = lm.apply(lm_params, ys_in)
        lm_logp = jax.nn.log_softmax(lm_logits.astype(jnp.float32), axis=-1)
        lm_tok = jnp.take_along_axis(lm_logp, tgt[..., None], axis=-1)[..., 0]
        lm_score = jnp.sum(
            jnp.where(pos <= lens_f[:, None], lm_tok, 0.0), axis=1)
        final = final + lm_weight * lm_score.reshape(b, w)
    # dead n-best slots (CTC score ~NEG_INF) must stay dead
    final = jnp.where(ctc_scores <= NEG_INF / 2, NEG_INF, final)
    order = jnp.argsort(-final, axis=1)
    return {
        "tokens": jnp.take_along_axis(toks, order[..., None], axis=1),
        "scores": jnp.take_along_axis(final, order, axis=1),
        "lengths": jnp.take_along_axis(lens, order, axis=1),
        "att_scores": jnp.take_along_axis(att_score.reshape(b, w), order,
                                          axis=1),
        "ctc_scores": jnp.take_along_axis(ctc_scores, order, axis=1),
    }
