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
from tpu_asr.ops.topk import exact_top_k


def _encode_and_fire(model, params, feats, feat_lengths, max_len,
                     scale_fire=True):
    """scale_fire=True renormalizes alphas to the rounded fire count
    before firing (keeps the boundary geometry consistent with training,
    where alphas are always scaled to sum to U+1). scale_fire=False is
    the reference's inference behavior — fire on raw sigmoid alphas; the
    tail-rounded final fire is then the *unnormalized* residual
    accumulation (what cif_weights assigns to the last partial interval),
    matching StreamingCIFRecognizer exactly."""
    cfg = model.cfg
    enc_out, enc_lengths, alphas, valid = model.apply(
        params, feats, feat_lengths, method=CifModel.encode)
    n_fire = jnp.minimum(
        fire_count(alphas, valid, cfg.cif_tail_threshold), max_len)
    if scale_fire:
        from tpu_asr.ops.cif import scale_alphas
        alphas = scale_alphas(alphas, valid, n_fire)
    fired = cif_fire(enc_out.astype(jnp.float32), alphas, max_len)
    return fired, n_fire


def cif_beam_decode(
    model: CifModel,
    params,
    feats: jnp.ndarray,
    feat_lengths: jnp.ndarray,
    beam: int = 5,
    max_len: int = 64,
    pad_id: int = -1,
    scale_fire: bool = True,
):
    """Beam search over the CIF decoder.

    CIF emits exactly n_fire tokens per utterance, so the search is over
    token choices at fixed length: beams score sum-logprob over positions
    < n_fire (later positions are cost-free), top-W kept per step.
    Returns (tokens [B, max_len] pad_id-padded, lengths [B]) best-first.
    """
    cfg = model.cfg
    b = feats.shape[0]
    w = beam
    n = b * w
    fired, n_fire = _encode_and_fire(model, params, feats, feat_lengths,
                                     max_len, scale_fire)
    fired_flat = jnp.repeat(fired, w, axis=0)          # [B*W, U, D]
    n_fire_flat = jnp.repeat(n_fire, w, axis=0)
    dec_params = {"params": params["params"]["decoder"]}
    dec = CifDecoder(cfg)
    cache = dec.apply(dec_params, n, max_len, method=CifDecoder.init_cache)
    sos = cfg.vocab_size - 2
    eos = cfg.vocab_size - 1
    neg_inf = -1e30

    def gather_beams(tree, beam_idx):
        def g(x):
            xr = x.reshape(b, w, *x.shape[1:])
            idx = beam_idx.reshape(b, w, *([1] * (x.ndim - 1)))
            return jnp.take_along_axis(xr, idx, axis=1).reshape(x.shape)
        return jax.tree.map(g, tree)

    def step(carry, pos):
        y_prev, cache, scores, tokens = carry
        logits, cache = dec.apply(dec_params, y_prev, fired_flat[:, pos],
                                  pos, cache, method=CifDecoder.step)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        done = (pos >= n_fire_flat)[:, None]           # [N, 1]
        v = logp.shape[-1]
        eos_forced = jnp.where(jnp.arange(v)[None, :] == eos, 0.0, neg_inf)
        logp = jnp.where(done, eos_forced, logp)
        cand = (scores.reshape(n)[:, None] + logp).reshape(b, w * v)
        top_scores, top_idx = exact_top_k(cand, w)
        beam_idx = top_idx // v
        tok = (top_idx % v).astype(jnp.int32)
        cache = gather_beams(cache, beam_idx)
        tokens = gather_beams(tokens.reshape(n, -1), beam_idx).reshape(
            b, w, -1)
        tokens = tokens.at[:, :, pos].set(tok)
        return (tok.reshape(n), cache, top_scores, tokens), None

    scores0 = jnp.tile(
        jnp.where(jnp.arange(w)[None, :] == 0, 0.0, neg_inf), (b, 1))
    carry0 = (jnp.full((n,), sos, jnp.int32), cache, scores0,
              jnp.full((b, w, max_len), eos, jnp.int32))
    # Early exit once pos passes every utterance's fire count: CIF emits
    # exactly n_fire tokens, so later steps only write eos into positions
    # the valid_pos mask below discards — exiting is exact.
    n_fire_max = jnp.max(n_fire)

    def _cond(state):
        pos, _ = state
        return pos < jnp.minimum(n_fire_max + 1, max_len)

    def _body(state):
        pos, carry = state
        carry, _ = step(carry, pos)
        return pos + 1, carry

    _, (_, _, scores, tokens) = jax.lax.while_loop(
        _cond, _body, (jnp.int32(0), carry0))
    best = jnp.argmax(scores, axis=1)
    toks = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    valid_pos = make_valid_mask(n_fire, max_len)
    after_eos = jnp.cumsum((toks == eos).astype(jnp.int32), axis=1) > 0
    keep = valid_pos & ~after_eos
    out = jnp.where(keep, toks, pad_id)
    return out, jnp.sum(keep, axis=1)


def cif_greedy_decode(
    model: CifModel,
    params,
    feats: jnp.ndarray,
    feat_lengths: jnp.ndarray,
    max_len: int = 64,
    pad_id: int = -1,
    scale_fire: bool = True,
):
    """Returns (tokens [B, max_len] pad_id-padded, lengths [B])."""
    cfg = model.cfg
    # _encode_and_fire renormalizes alphas to the predicted fire count:
    # training always fires on scaled alphas (sum == U+1), so self-scaling
    # keeps the fired embeddings' boundary geometry consistent between
    # train and inference.
    fired, n_fire = _encode_and_fire(model, params, feats, feat_lengths,
                                     max_len, scale_fire)
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

    # Early-exit while loop (see cif_beam_decode): positions at/after each
    # row's n_fire are masked below, so once pos passes max(n_fire) the
    # remaining steps could only write masked positions. The token buffer
    # is eos-initialized, matching what the eos-forced tail steps of the
    # full-length scan would have produced.
    n_fire_max = jnp.max(n_fire)
    toks0 = jnp.full((b, max_len), eos, jnp.int32)

    def _cond(state):
        pos, _, _, _ = state
        return pos < jnp.minimum(n_fire_max + 1, max_len)

    def _body(state):
        pos, y_prev, cache, toks = state
        (y_prev, cache), tok = step((y_prev, cache), pos)
        return pos + 1, y_prev, cache, toks.at[:, pos].set(tok)

    _, _, _, toks = jax.lax.while_loop(
        _cond, _body,
        (jnp.int32(0), jnp.full((b,), sos, jnp.int32), cache, toks0))
    # mask positions at/after the fire count or after an emitted eos
    valid_pos = make_valid_mask(n_fire, max_len)
    is_eos = toks == eos
    after_eos = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) > 0
    keep = valid_pos & ~after_eos
    tokens = jnp.where(keep, toks, pad_id)
    lengths = jnp.sum(keep, axis=1)
    return tokens, lengths
