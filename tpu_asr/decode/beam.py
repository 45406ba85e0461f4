"""Batched attention beam search, fully compiled (early-exit while_loop).

The reference's `Decoder.recognize_beam` (src/transformer/decoder.py) is a
host-driven python loop: batch=1, one device round-trip per token per beam —
the #1 perf sin SURVEY.md 3.2 flags. This redesign keeps the whole search on
device with static shapes: fixed beam width W, fixed max_len, explicit KV
caches reordered by gather at each step, eos-forced continuation for
finished hypotheses, and (optionally) joint CTC/attention scoring via the
vectorized CTCPrefixScorer (BASELINE.json config #3).

Joint score per Watanabe et al.: S = (1-l) * logP_att + l * logP_ctc,
accumulated incrementally (psi differences) inside the same loop.

Optional shallow fusion (beyond the reference; espnet-family convention):
S += lm_weight * logP_lm, with the external TransformerLM
(models/lm.py) advanced inside the same scan via its cached step API —
its K/V caches ride the carry and are beam-reordered with the same
one-hot MXU gather as the decoder caches, so fusion adds one small
matmul chain per step and no host round-trips.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from tpu_asr.decode.ctc_prefix import CTCPrefixScorer
from tpu_asr.ops.topk import exact_top_k

NEG_INF = -1e30
# auto threshold for BeamConfig.ctc_two_pass=None. Measured on v5e
# (AISHELL-shaped workload, lane-packed Pallas scorer): one-pass wins at
# BOTH beam 5 (511x vs 444x) and beam 10 (314x vs 276x) — the second
# sequential K=1 scan costs more than the K-history traffic it saves, so
# auto never picks two-pass on this hardware; the knob remains for wider
# beams / longer T where the traffic term grows.
CTC_TWO_PASS_BEAM = 10_000


@dataclasses.dataclass(frozen=True)
class BeamConfig:
    beam: int = 5
    max_len: int = 64
    ctc_weight: float = 0.0          # joint scoring weight (0 = pure attn)
    ctc_cand: int = 0                # CTC-scored candidates/beam (0 = 2*beam)
    length_penalty: float = 0.0      # added per emitted token to final score
    nbest: int = 1
    # Per-utterance decode-length control (reference recognize_beam
    # semantics): maxlenratio > 0 caps each utterance at
    # floor(maxlenratio * enc_length) real tokens, after which an UNSCORED
    # eos is forced (the reference appends eos at maxlen without scoring
    # it); 0 = static cfg.max_len only. minlenratio > 0 bans eos until
    # floor(minlenratio * enc_length) tokens have been emitted — realized
    # as an eos score mask inside the static scan (the reference instead
    # drops too-short ended hyps; masking is the in-beam equivalent).
    maxlenratio: float = 0.0
    minlenratio: float = 0.0
    # Shallow-fusion weight for the external LM (0 = no fusion; the LM
    # module/params are passed to attention_beam_search directly).
    lm_weight: float = 0.0
    # Joint-scoring execution strategy. One-pass scores all K candidates
    # AND materializes their [N, K, T, 2] r histories, then gathers the
    # winners; two-pass scores without histories and re-advances only the
    # W selected tokens (a second K=1 scan). History traffic grows with
    # K = 2W+1, so one-pass wins at small beams (measured r2: 807x vs
    # 702x at W=5) and two-pass at wide beams. None = auto (two-pass for
    # beam >= CTC_TWO_PASS_BEAM).
    ctc_two_pass: bool | None = None


def _tile_beams(x, w):
    """[B, ...] -> [B*W, ...] repeating each row W times."""
    return jnp.repeat(x, w, axis=0)


def attention_beam_search(
    decoder,
    dec_params,
    enc_out: jnp.ndarray,
    enc_lengths: jnp.ndarray,
    sos_id: int,
    eos_id: int,
    cfg: BeamConfig = BeamConfig(),
    ctc_logp: jnp.ndarray | None = None,
    lm=None,
    lm_params=None,
):
    """Run beam search over a batch of utterances.

    decoder: tpu_asr.models.decoder.Decoder (module def); dec_params: its
    variables; enc_out [B, T, D]; ctc_logp [B, T, V] (log-softmaxed CTC
    posteriors) required when cfg.ctc_weight > 0. lm/lm_params: an
    optional tpu_asr.models.lm.TransformerLM for shallow fusion
    (used when cfg.lm_weight > 0).

    Returns dict(tokens [B, W, max_len] eos-padded, scores [B, W],
    lengths [B, W]) sorted best-first.
    """
    b, t, _ = enc_out.shape
    w = cfg.beam
    n = b * w
    use_ctc = cfg.ctc_weight > 0.0
    lam = cfg.ctc_weight

    cross_kv = decoder.apply(dec_params, enc_out,
                             method=type(decoder).precompute_cross_kv)
    cross_kv = jax.tree.map(lambda x: _tile_beams(x, w), cross_kv)
    enc_lengths_flat = _tile_beams(enc_lengths, w)
    cache = decoder.apply(dec_params, n, cfg.max_len,
                          method=type(decoder).init_cache)
    use_lm = cfg.lm_weight > 0.0 and lm is not None
    lm_cache0 = (lm.apply(lm_params, n, cfg.max_len,
                          method=type(lm).init_cache) if use_lm else ())

    scorer = None
    ctc_state = None
    if use_ctc:
        assert ctc_logp is not None, "joint scoring needs ctc log-probs"
        scorer = CTCPrefixScorer(
            ctc_logp, enc_lengths_flat, blank=0, eos=eos_id, beams=w)
        ctc_state = scorer.init_state()
    k_cand = cfg.ctc_cand or 2 * w
    if ctc_logp is not None:
        k_cand = min(k_cand, ctc_logp.shape[-1])
    two_pass = (cfg.ctc_two_pass if cfg.ctc_two_pass is not None
                else w >= CTC_TWO_PASS_BEAM)

    def dec_step(y_prev, pos, cache):
        return decoder.apply(dec_params, y_prev, pos, cache, cross_kv,
                             enc_lengths_flat, method=type(decoder).step)

    def gather_beams(tree, beam_idx):
        """Reorder [B*W, ...] state by per-batch beam indices [B, W].

        Large float leaves (the KV caches) use a one-hot permutation
        matmul instead of take_along_axis: inside the scan XLA lowers the
        small-domain beam gather to W-way select chains (~1.7 ms/step at
        W=10 across the 12 cache tensors, the top post-top_k cost in the
        beam-10 trace), while the MXU permutation streams at memory
        bandwidth. Exact: one-hot rows select a single element; f32
        accumulation of one nonzero product is the element itself.
        """
        perm = jax.nn.one_hot(beam_idx, w, axis=-1)       # [B, W, W]
        def g(x):
            if (jnp.issubdtype(x.dtype, jnp.floating)
                    and x.size // n >= 512):
                xr = x.reshape(b, w, -1)
                out = jnp.einsum("bwv,bvf->bwf", perm.astype(x.dtype), xr)
                return out.reshape(x.shape)
            xr = x.reshape(b, w, *x.shape[1:])
            idx = beam_idx.reshape(b, w, *([1] * (x.ndim - 1)))
            return jnp.take_along_axis(xr, idx, axis=1).reshape(x.shape)
        return jax.tree.map(g, tree)

    # Per-utterance length control (see BeamConfig). utt_maxlen counts real
    # tokens before the forced unscored eos; utt_minlen bans eos earlier.
    if cfg.maxlenratio > 0:
        utt_maxlen = jnp.clip(
            jnp.floor(cfg.maxlenratio * enc_lengths).astype(jnp.int32),
            1, cfg.max_len)
    else:
        utt_maxlen = jnp.full((b,), cfg.max_len, jnp.int32)
    utt_minlen = (
        jnp.floor(cfg.minlenratio * enc_lengths).astype(jnp.int32)
        if cfg.minlenratio > 0 else jnp.zeros((b,), jnp.int32))

    def step(carry, pos):
        (y_prev, cache, scores, finished, lengths, tokens, ctc_state,
         lm_cache) = carry
        logits, cache = dec_step(y_prev, pos, cache)
        att_logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if use_lm:
            lm_logits, lm_cache = lm.apply(lm_params, y_prev, pos, lm_cache,
                                           method=type(lm).step)
            lm_logp = jax.nn.log_softmax(lm_logits.astype(jnp.float32),
                                         axis=-1)
        must_end = pos >= utt_maxlen[:, None]           # [B, 1]
        ban_eos = pos < utt_minlen[:, None]             # [B, 1]
        ended = finished | must_end                     # [B, W]

        if use_ctc:
            # Top-K att candidates per beam (+ eos forced into the set).
            cand_logp, cand_ids = exact_top_k(att_logp, k_cand)  # [N, K]
            cand_ids = jnp.concatenate(
                [cand_ids, jnp.full((n, 1), eos_id, cand_ids.dtype)], axis=1)
            cand_logp = jnp.concatenate(
                [cand_logp, att_logp[:, eos_id][:, None]], axis=1)
            is_first = jnp.full((n,), False) | (pos == 0)
            # Strategy per BeamConfig.ctc_two_pass: one-pass materializes
            # all K r histories in the scoring scan (sequential latency
            # dominates at small beams — measured 807x vs 702x at W=5);
            # two-pass skips them and re-advances only the W winners
            # (history traffic grows with K, wins at wide beams).
            psi, new_r = scorer.score(cand_ids, y_prev, is_first, ctc_state,
                                      return_r=not two_pass)
            _, psi_prev = ctc_state
            step_score = ((1.0 - lam) * cand_logp
                          + lam * (psi - psi_prev[:, None]))      # [N, K+1]
            if use_lm:
                # shallow fusion: += beta * logP_lm at each candidate id
                # (candidate SELECTION stays attention-top-k, the espnet
                # pre-beam convention — the LM only reweights)
                step_score = step_score + cfg.lm_weight * jnp.take_along_axis(
                    lm_logp, cand_ids, axis=1)
            k_tot = k_cand + 1
            # minlen: ban eos candidates (finished/forced override below)
            step_score = jnp.where(
                (cand_ids == eos_id)
                & jnp.broadcast_to(ban_eos, finished.shape).reshape(n)[:, None],
                NEG_INF, step_score)
            # finished (or maxlen-forced) beams: only the eos slot
            # continues, at zero cost — the reference appends an unscored
            # eos at maxlen.
            eos_slot = jnp.arange(k_tot)[None, :] == k_cand
            step_score = jnp.where(
                jnp.broadcast_to(ended, finished.shape).reshape(n)[:, None],
                jnp.where(eos_slot, 0.0, NEG_INF), step_score)
            cand = scores.reshape(n)[:, None] + step_score
            cand = cand.reshape(b, w * k_tot)
            top_scores, top_idx = exact_top_k(cand, w)          # [B, W]
            beam_idx = top_idx // k_tot
            slot_idx = top_idx % k_tot
            flat_beam = (jnp.arange(b)[:, None] * w + beam_idx).reshape(n)
            tok = jnp.take_along_axis(
                cand_ids[flat_beam].reshape(b, w, k_tot),
                slot_idx[..., None], axis=2)[..., 0]              # [B, W]
            psi_sel = jnp.take_along_axis(
                psi[flat_beam].reshape(b, w, k_tot),
                slot_idx[..., None], axis=2)[..., 0].reshape(n)
            old_r, old_psi = ctc_state
            old_r_g = old_r[flat_beam]
            old_psi_g = old_psi[flat_beam]
            if two_pass:
                # re-advance ONLY the selected tokens (K=1 scan) instead
                # of having materialized+gathered all K histories
                y_last_g = y_prev[flat_beam]
                r_next, _ = scorer.advance(tok.reshape(n), y_last_g,
                                           is_first, (old_r_g, old_psi_g))
            else:
                # gather ctc states for the chosen (beam, slot)
                new_r_sel = new_r[flat_beam].reshape(b, w, k_tot, t, 2)
                r_next = jnp.take_along_axis(
                    new_r_sel, slot_idx[:, :, None, None, None], axis=2
                )[:, :, 0].reshape(n, t, 2)
            # finished/eos beams keep their old prefix state
            was_finished = finished.reshape(b, w)
            was_finished_g = jnp.take_along_axis(was_finished, beam_idx,
                                                 axis=1).reshape(n)
            keep_old = was_finished_g | (tok.reshape(n) == eos_id)
            r_next = jnp.where(keep_old[:, None, None], old_r_g, r_next)
            psi_next = jnp.where(keep_old, old_psi_g, psi_sel)
            ctc_state = (r_next, psi_next)
        else:
            fused = (att_logp + cfg.lm_weight * lm_logp if use_lm
                     else att_logp)
            logp = fused.reshape(b, w, -1)
            v = logp.shape[-1]
            is_eos_col = jnp.arange(v)[None, None, :] == eos_id
            # minlen: ban eos until utt_minlen tokens emitted
            logp = jnp.where(is_eos_col & ban_eos[..., None], NEG_INF, logp)
            eos_forced = jnp.where(is_eos_col, 0.0, NEG_INF)
            logp = jnp.where(ended[..., None], eos_forced, logp)
            cand = (scores[..., None] + logp).reshape(b, w * v)
            top_scores, top_idx = exact_top_k(cand, w)
            beam_idx = top_idx // v
            tok = top_idx % v

        # reorder all per-beam state
        cache = gather_beams(cache, beam_idx)
        if use_lm:
            lm_cache = gather_beams(lm_cache, beam_idx)
        tokens = gather_beams(tokens.reshape(n, -1), beam_idx).reshape(
            b, w, -1)
        finished_g = jnp.take_along_axis(finished, beam_idx, axis=1)
        lengths_g = jnp.take_along_axis(lengths, beam_idx, axis=1)

        now_eos = tok == eos_id
        tokens = tokens.at[:, :, pos].set(
            jnp.where(finished_g, eos_id, tok))
        lengths = jnp.where(finished_g, lengths_g,
                            jnp.where(now_eos, pos, pos + 1))
        finished = finished_g | now_eos
        scores = top_scores
        y_prev = tok.reshape(n)
        return (y_prev, cache, scores, finished, lengths, tokens,
                ctc_state, lm_cache), None

    scores0 = jnp.where(jnp.arange(w)[None, :] == 0, 0.0, NEG_INF)
    scores0 = jnp.tile(scores0, (b, 1))
    carry0 = (
        jnp.full((n,), sos_id, jnp.int32),
        cache,
        scores0,
        jnp.zeros((b, w), bool),
        jnp.zeros((b, w), jnp.int32),
        jnp.full((b, w, cfg.max_len), eos_id, jnp.int32),
        ctc_state,
        lm_cache0,
    )
    # Early-exit while loop instead of a fixed-length scan: once every
    # hypothesis in the batch is finished (decoder emitted eos, or
    # maxlenratio forced it), each further step is output-neutral — the
    # eos slot continues at zero cost, tokens stay eos-padded, lengths
    # and prefix states are kept — so exiting is exact (final ordering is
    # restored by the argsort below).  lax.scan lowers to the same HLO
    # While, so the only added per-step cost is the all(finished) reduce
    # in the condition; the win on trained models is large (utterances
    # finish at ~1/3 of max_len on AISHELL-shaped decodes).
    def _cond(state):
        pos, carry = state
        return (pos < cfg.max_len) & ~jnp.all(carry[3])

    def _body(state):
        pos, carry = state
        carry, _ = step(carry, pos)
        return pos + 1, carry

    _, (y_prev, cache, scores, finished, lengths, tokens, ctc_state,
        _lm_cache) = jax.lax.while_loop(
            _cond, _body, (jnp.int32(0), carry0))

    # Unfinished hyps at max_len: keep accumulated score (reference appends
    # eos at maxlen); optional per-token length reward.
    final = scores + cfg.length_penalty * lengths.astype(jnp.float32)
    order = jnp.argsort(-final, axis=1)
    return {
        "tokens": jnp.take_along_axis(tokens, order[..., None], axis=1),
        "scores": jnp.take_along_axis(final, order, axis=1),
        "lengths": jnp.take_along_axis(lengths, order, axis=1),
    }
