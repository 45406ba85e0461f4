"""CTC prefix beam search — frame-synchronous, batched, fully compiled.

The reference decodes CTC-only models greedily (argmax + collapse); this
is the standard quality upgrade (Hannun et al. 2014 prefix beam search)
recast for TPU: fixed beam width W and per-frame candidate top-K, one
`lax.scan` over frames, NO host round-trips. Per frame and beam:

  stay    (same prefix):  pb' = (pb ⊕ pnb) + lp[blank]
                          pnb' = pnb + lp[last]        (repeat collapses)
  extend  (prefix + c):   pnb' = (c == last ? pb : pb ⊕ pnb) + lp[c]

The classic hard part — merging candidates that materialize the SAME
prefix (a stay of beam i vs an extend of beam j) — is done exactly with a
vectorized [N, N] prefix-equality matrix over the N = W·(K+1) candidates:
equal candidates logsumexp into their first occurrence, duplicates are
masked to -inf, then top-W survives. N is small (e.g. 5·(8+1) = 45), so
the N²·L compare is one cheap VPU op, which is the TPU-native trade: a
little redundant compute for zero dynamic shapes.

Padding rows (length-0 utterances) and frames past each utterance's
length are no-ops via masked updates.

Optional LM shallow fusion (beyond-reference, matching the attention/
joint beam and transducer ALSD): candidates are RANKED by the fused
score  logP_ctc(prefix) + lm_weight * logP_lm(prefix)  while the pb/pnb
recursion stays purely acoustic. The LM score is a function of the
prefix alone, so the exact duplicate merge is unaffected (equal prefixes
carry equal LM scores). The external TransformerLM advances inside the
same lax.scan via its per-row-position ``step_at`` cache API — one LM
step over all B*W beams per frame (idempotent for beams that stayed:
re-feeding the same token at the same position rewrites identical K/V).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from tpu_asr.ops.topk import exact_top_k

NEG_INF = -1e30


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF / 2)
    out = m_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


def beam_init(b: int, beam: int, max_len: int, pad_id: int = -1,
              lm=None, lm_params=None, sos: int | None = None):
    """Fresh beam-search state (also the streaming carry): only beam 0 is
    live (the empty prefix, pb=0). With an LM, the state grows three
    fused-scoring elements: per-beam cumulative weighted LM score, the
    next-token LM log-probs for each beam's prefix (seeded by one
    ``step_at`` on <sos>), and the LM K/V caches [B*W, max_len+1, ...]."""
    w = beam
    prefixes0 = jnp.full((b, w, max_len), pad_id, jnp.int32)
    lens0 = jnp.zeros((b, w), jnp.int32)
    pb0 = jnp.where(jnp.arange(w)[None, :] == 0, 0.0, NEG_INF)
    pb0 = jnp.broadcast_to(pb0, (b, w))
    pnb0 = jnp.full((b, w), NEG_INF)
    last0 = jnp.full((b, w), -1, jnp.int32)   # -1: no last token
    state = (prefixes0, lens0, pb0, pnb0, last0)
    if lm is None:
        return state
    assert sos is not None, "LM fusion needs the sos id"
    cache0 = lm.apply(lm_params, b * w, max_len + 1,
                      method=type(lm).init_cache)
    y0 = jnp.full((b * w,), sos, jnp.int32)
    pos0 = jnp.zeros((b * w,), jnp.int32)
    logits0, cache0 = lm.apply(lm_params, y0, pos0, cache0,
                               method=type(lm).step_at)
    lm_lp0 = jax.nn.log_softmax(
        logits0.astype(jnp.float32), axis=-1).reshape(b, w, -1)
    lm_sc0 = jnp.zeros((b, w), jnp.float32)
    return state + (lm_sc0, lm_lp0, cache0)


def beam_advance(state, logp, frame_valid, topk: int = 8, blank: int = 0,
                 lm=None, lm_params=None, lm_weight: float = 0.0,
                 sos: int | None = None):
    """Advance the search over logp [B, Tc, V] (log-softmaxed) with
    frame_valid [B, Tc]; frame-synchronous, so chunk-at-a-time advances
    compose to exactly the full-utterance search (the streaming use).
    When ``state`` carries LM elements (built by ``beam_init(lm=...)``),
    pass the same lm/lm_params/lm_weight/sos for shallow fusion."""
    b, w, max_len = state[0].shape
    v = logp.shape[-1]
    k = min(topk, v - 1)
    fused = len(state) == 8
    assert (lm is not None) == fused, \
        "state arity and lm argument must agree"

    n = w * (k + 1)                       # stay + K extends per beam

    def step(carry, lp_t):
        if fused:
            prefixes, lens, pb, pnb, last, lm_sc, lm_lp, lm_cache = carry
        else:
            prefixes, lens, pb, pnb, last = carry
        lp, fvalid = lp_t                         # lp [B, V]; fvalid [B]
        lp_blank = lp[:, blank]                   # [B]
        total = _logaddexp(pb, pnb)               # [B, W]

        # stay candidates (one per beam): same prefix
        stay_pb = total + lp_blank[:, None]
        lp_last = jnp.take_along_axis(
            lp, jnp.maximum(last, 0), axis=-1)    # [B, W]
        stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG_INF)

        # extend candidates: top-K non-blank tokens per frame
        lp_nb = lp.at[:, blank].set(NEG_INF)
        top_lp, top_c = exact_top_k(lp_nb, k)   # [B, K]
        c = jnp.broadcast_to(top_c[:, None, :], (b, w, k))       # [B,W,K]
        clp = jnp.broadcast_to(top_lp[:, None, :], (b, w, k))
        same = c == last[..., None]
        ext_pnb = jnp.where(same, pb[..., None],
                            total[..., None]) + clp              # [B,W,K]
        can_extend = lens < max_len                              # [B, W]
        ext_pnb = jnp.where(can_extend[..., None], ext_pnb, NEG_INF)

        # materialize candidate pool [B, N]: first W are stays, rest extends
        parent = jnp.concatenate(
            [jnp.arange(w), jnp.repeat(jnp.arange(w), k)])       # [N]
        app = jnp.concatenate(
            [jnp.full((b, w), -1, jnp.int32),
             c.reshape(b, w * k)], axis=1)                       # [B, N]
        cand_pb = jnp.concatenate(
            [stay_pb, jnp.full((b, w * k), NEG_INF)], axis=1)
        cand_pnb = jnp.concatenate(
            [stay_pnb, ext_pnb.reshape(b, w * k)], axis=1)

        par_pref = prefixes[:, parent]                           # [B,N,L]
        par_len = lens[:, parent]                                # [B, N]
        is_ext = app >= 0
        pos = jnp.arange(max_len)[None, None, :]
        cand_pref = jnp.where(
            is_ext[..., None] & (pos == par_len[..., None]),
            app[..., None], par_pref)
        cand_len = par_len + is_ext.astype(jnp.int32)
        cand_last = jnp.where(is_ext, app, last[:, parent])

        if fused:
            # prefix-function LM score: parent's cumulative score plus
            # (for extends) the weighted next-token log-prob under the
            # parent's LM distribution. Equal prefixes carry equal LM
            # scores, so the duplicate merge below needs no LM change.
            par_lm_lp = lm_lp[:, parent]                         # [B,N,V]
            ext_lp = jnp.take_along_axis(
                par_lm_lp, jnp.maximum(app, 0)[..., None], axis=-1)[..., 0]
            cand_lm = lm_sc[:, parent] + jnp.where(
                is_ext, lm_weight * ext_lp, 0.0)                 # [B, N]

        # exact duplicate merge: logsumexp equal prefixes into the first
        eq = (cand_len[:, :, None] == cand_len[:, None, :]) & jnp.all(
            cand_pref[:, :, None] == cand_pref[:, None, :], axis=-1)
        idx = jnp.arange(n)
        first = jnp.argmax(eq, axis=-1)                          # [B, N]
        is_first = first == idx[None, :]
        merged_pb = _merge_lse(eq, cand_pb)
        merged_pnb = _merge_lse(eq, cand_pnb)
        cand_pb = jnp.where(is_first, merged_pb, NEG_INF)
        cand_pnb = jnp.where(is_first, merged_pnb, NEG_INF)

        cand_total = _logaddexp(cand_pb, cand_pnb)
        if fused:
            cand_total = cand_total + cand_lm
        top_scores, top_idx = exact_top_k(cand_total, w)       # [B, W]

        def pick(x):
            return jnp.take_along_axis(
                x, top_idx.reshape(b, w, *([1] * (x.ndim - 2))), axis=1)

        new = (pick(cand_pref), pick(cand_len[..., None])[..., 0],
               pick(cand_pb[..., None])[..., 0],
               pick(cand_pnb[..., None])[..., 0],
               pick(cand_last[..., None])[..., 0])
        old_state = (prefixes, lens, pb, pnb, last)
        if fused:
            new_lm_sc = pick(cand_lm[..., None])[..., 0]
            sel_parent = parent[top_idx]                         # [B, W]
            flat = (jnp.arange(b)[:, None] * w + sel_parent).reshape(-1)
            cache = jax.tree_util.tree_map(lambda x: x[flat], lm_cache)
            new_len, new_last = new[1], new[4]
            # feed y_L at position L (sos at 0 when empty) -> P(y_{L+1}|.)
            y_in = jnp.where(new_len > 0, new_last, sos).reshape(-1)
            pos = new_len.reshape(-1)
            lgt, cache = lm.apply(lm_params, y_in, pos, cache,
                                  method=type(lm).step_at)
            new_lm_lp = jax.nn.log_softmax(
                lgt.astype(jnp.float32), axis=-1).reshape(b, w, -1)
            new = new + (new_lm_sc, new_lm_lp, cache)
            old_state = old_state + (lm_sc, lm_lp, lm_cache)
        # frames past the utterance length are no-ops
        keep = fvalid[:, None]                                   # [B, 1]
        keep_flat = jnp.broadcast_to(keep, (b, w)).reshape(-1)

        def mask(o, old):
            if isinstance(o, dict):                  # LM cache pytree
                return jax.tree_util.tree_map(
                    lambda a, b_: jnp.where(
                        keep_flat.reshape(-1, *([1] * (a.ndim - 1))),
                        a, b_), o, old)
            kb = keep.reshape(b, 1, *([1] * (o.ndim - 2)))
            return jnp.where(kb, o, old)

        out = tuple(mask(o, old) for o, old in zip(new, old_state))
        return out, None

    frames = jnp.moveaxis(logp, 1, 0)                            # [Tc,B,V]
    valid = jnp.moveaxis(frame_valid, 1, 0)                      # [Tc, B]
    state, _ = jax.lax.scan(step, state, (frames, valid))
    return state


def beam_finalize(state):
    """-> (tokens [B, W, max_len], lengths [B, W], scores [B, W]),
    sorted best-first by log P(prefix) (+ the weighted LM score when the
    state carries fusion elements)."""
    prefixes, lens, pb, pnb = state[0], state[1], state[2], state[3]
    scores = _logaddexp(pb, pnb)
    if len(state) == 8:
        scores = scores + state[5]
    order = jnp.argsort(-scores, axis=-1)
    prefixes = jnp.take_along_axis(prefixes, order[..., None], axis=1)
    lens = jnp.take_along_axis(lens, order, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    return prefixes, lens, scores


def ctc_prefix_beam_search(
    ctc_logits: jnp.ndarray,
    enc_lengths: jnp.ndarray,
    beam: int = 5,
    topk: int = 8,
    max_len: int = 200,
    blank: int = 0,
    pad_id: int = -1,
    lm=None,
    lm_params=None,
    lm_weight: float = 0.0,
    sos: int | None = None,
):
    """ctc_logits [B, T, V], enc_lengths [B] ->
    (tokens [B, beam, max_len] pad_id-padded, lengths [B, beam],
    scores [B, beam] log P(prefix) [+ lm_weight*logP_lm when fused])
    sorted best-first."""
    b, t, _ = ctc_logits.shape
    logp = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), axis=-1)
    frame_valid = jnp.arange(t)[None, :] < enc_lengths[:, None]  # [B, T]
    use_lm = lm is not None and lm_weight > 0.0
    state = beam_init(b, beam, max_len, pad_id,
                      lm=lm if use_lm else None, lm_params=lm_params,
                      sos=sos)
    state = beam_advance(state, logp, frame_valid, topk=topk, blank=blank,
                         lm=lm if use_lm else None, lm_params=lm_params,
                         lm_weight=lm_weight, sos=sos)
    return beam_finalize(state)


def _merge_lse(eq, x):
    """Row-wise logsumexp of x over each equality group: [B,N,N]x[B,N]."""
    vals = jnp.where(eq, x[:, None, :], NEG_INF)       # [B, N(out), N(in)]
    m = jnp.max(vals, axis=-1)
    m_safe = jnp.maximum(m, NEG_INF / 2)
    s = jnp.sum(jnp.exp(vals - m_safe[..., None]), axis=-1)
    return jnp.where(m <= NEG_INF / 2, NEG_INF,
                     m_safe + jnp.log(jnp.maximum(s, 1e-37)))
