"""CIF inference: fire from raw alphas with tail rounding, then a compiled
autoregressive greedy decode over the fired embeddings.

Reference: the CIF model's recognize path — inference fires WITHOUT the
training-time alpha scaling, rounds the tail (residual accumulation >= 0.5
fires once more), then runs the decoder one fired embedding at a time. Here
the fire step is the parallel overlap matmul and the decode loop is one
lax.scan (batched, static shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_asr.models.cif import CifDecoder, CifModel
from tpu_asr.ops.cif import cif_fire, fire_count
from tpu_asr.utils.padding import make_valid_mask


def cif_greedy_decode(
    model: CifModel,
    params,
    feats: jnp.ndarray,
    feat_lengths: jnp.ndarray,
    max_len: int = 64,
    pad_id: int = -1,
):
    """Returns (tokens [B, max_len] pad_id-padded, lengths [B])."""
    cfg = model.cfg
    enc_out, enc_lengths, alphas, valid = model.apply(
        params, feats, feat_lengths, method=CifModel.encode)
    n_fire = jnp.minimum(
        fire_count(alphas, valid, cfg.cif_tail_threshold), max_len)
    # Inference-time self-scaling: renormalize alphas so they sum exactly
    # to the predicted fire count. Training always fires on scaled alphas
    # (sum == U+1), so this keeps the fired embeddings' boundary geometry
    # consistent between train and inference (the raw-alpha residual
    # otherwise smears every boundary by the accumulated length error).
    from tpu_asr.ops.cif import scale_alphas
    alphas = scale_alphas(alphas, valid, n_fire)
    fired = cif_fire(enc_out.astype(jnp.float32), alphas, max_len)  # [B,U,D]

    b = feats.shape[0]
    dec_params = {"params": params["params"]["decoder"]}
    dec = CifDecoder(cfg)
    cache = dec.apply(dec_params, b, max_len, method=CifDecoder.init_cache)
    sos = cfg.vocab_size - 2
    eos = cfg.vocab_size - 1

    def step(carry, pos):
        y_prev, cache = carry
        logits, cache = dec.apply(dec_params, y_prev, fired[:, pos], pos,
                                  cache, method=CifDecoder.step)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (tok, cache), tok

    (_, _), toks = jax.lax.scan(
        step, (jnp.full((b,), sos, jnp.int32), cache), jnp.arange(max_len))
    toks = jnp.moveaxis(toks, 0, 1)                        # [B, max_len]
    # mask positions at/after the fire count or after an emitted eos
    valid_pos = make_valid_mask(n_fire, max_len)
    is_eos = toks == eos
    after_eos = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) > 0
    keep = valid_pos & ~after_eos
    tokens = jnp.where(keep, toks, pad_id)
    lengths = jnp.sum(keep, axis=1)
    return tokens, lengths
