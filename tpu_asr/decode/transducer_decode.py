"""Transducer greedy decode — one compiled frame-synchronous while_loop.

The classic RNN-T greedy loop (Graves, arXiv:1211.3711; also the reference
family's per-utterance host loops, SURVEY.md 3.2) advances a (frame t,
label count u) pointer pair per utterance: argmax the joint at (t, u);
blank consumes the frame, a label extends the history and re-runs the
predictor. Host-driven, that is one device round-trip per step.

TPU-first redesign: the WHOLE batch advances inside one
`lax.while_loop` — every row carries its own (t, u, emitted-this-frame)
state, the predictor's cached step runs batched with per-row positions
(models/transducer.py Predictor.step), and rows that advance their frame
simply keep their predictor output (a `where` select). The loop runs until
every row has consumed its encoder frames; iteration count is bounded by
max(T) + max_tokens, every shape static. Hypotheses are bit-identical to
the per-utterance host loop (tested in tests/unit/test_transducer_model.py).

The loop body is factored as greedy_init / greedy_advance over an explicit
state dict so the STREAMING recognizer (decode/streaming.py) can run the
identical search chunk-by-chunk: the search state (label history, predictor
cache, token buffer) is the carry across pushes, which is what makes
streamed hypotheses exactly equal to offline ones.

max_symbols_per_frame caps label emissions per frame (standard guard
against degenerate non-blank loops early in training).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy_init(model, params, batch: int, max_tokens: int):
    """Fresh search state: empty history (sos consumed at position 0)."""
    sos = model.cfg.vocab_size - 2
    cache = model.apply(params, batch, max_tokens + 1,
                        method="predictor_init_cache")
    g0, cache = model.apply(
        params, jnp.full((batch,), sos, jnp.int32),
        jnp.zeros((batch,), jnp.int32), cache, method="predictor_step")
    return dict(
        u=jnp.zeros((batch,), jnp.int32),
        tokens=jnp.full((batch, max_tokens), -1, jnp.int32),
        times=jnp.full((batch, max_tokens), -1, jnp.int32),
        confs=jnp.zeros((batch, max_tokens), jnp.float32),
        g=g0,
        cache=cache,
    )


def greedy_advance(model, params, f, n_valid, state,
                   max_symbols_per_frame: int = 4, frame_offset=0):
    """Consume frames f[:, :n_valid] (per row), extending the search state.

    f: [B, Tc, d_joint] encoder-side joint features; n_valid: [B] valid
    frame counts within f. Each call starts at local frame 0 — the caller
    slices f to the not-yet-consumed frames (a chunk, or the whole
    utterance) and passes the chunk's global start as frame_offset so
    emission timestamps (state["times"], encoder frame of each emitted
    token) stay global. Returns the advanced state.
    """
    b, t_max, _ = f.shape
    max_tokens = state["tokens"].shape[1]
    sos = model.cfg.vocab_size - 2
    blank = 0
    rows = jnp.arange(b)
    n_valid = jnp.minimum(n_valid, t_max)

    state = dict(state, t=jnp.zeros((b,), jnp.int32),
                 emitted=jnp.zeros((b,), jnp.int32))

    def cond(st):
        return jnp.any(st["t"] < n_valid)

    def body(st):
        t, u = st["t"], st["u"]
        f_t = f[rows, jnp.clip(t, 0, t_max - 1)]              # [B, dj]
        logits = model.apply(params, f_t, st["g"],
                             method="joint_step")             # [B, V]
        k = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        active = t < n_valid
        emit = active & (k != blank) & (u < max_tokens) & \
            (st["emitted"] < max_symbols_per_frame)
        u_clip = jnp.clip(u, 0, max_tokens - 1)
        cur = st["tokens"][rows, u_clip]
        tokens = st["tokens"].at[rows, u_clip].set(
            jnp.where(emit, k, cur))
        times = st["times"].at[rows, u_clip].set(
            jnp.where(emit, frame_offset + t, st["times"][rows, u_clip]))
        # per-token confidence: softmax prob of the emitted token
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        k_lp = jnp.take_along_axis(logp, k[:, None], axis=1)[:, 0]
        confs = st["confs"].at[rows, u_clip].set(
            jnp.where(emit, jnp.exp(k_lp), st["confs"][rows, u_clip]))
        # Predictor advances only on emit rows; the step itself runs
        # batched (one program), non-emit rows keep g and cache.
        k_safe = jnp.where(emit, k, sos)
        g_new, cache_new = model.apply(
            params, k_safe, jnp.minimum(u + 1, max_tokens), st["cache"],
            method="predictor_step")
        g = jnp.where(emit[:, None], g_new, st["g"])
        cache = jax.tree.map(
            lambda new, old: jnp.where(
                emit.reshape((b,) + (1,) * (old.ndim - 1)), new, old),
            cache_new, st["cache"])
        # blank (or cap) consumes the frame; a label stays on it.
        advance = active & ~emit
        return dict(
            t=jnp.where(advance, t + 1, t),
            u=jnp.where(emit, u + 1, u),
            emitted=jnp.where(emit, st["emitted"] + 1,
                              jnp.where(advance, 0, st["emitted"])),
            tokens=tokens, times=times, confs=confs, g=g, cache=cache)

    final = jax.lax.while_loop(cond, body, state)
    final.pop("t")
    final.pop("emitted")
    return final


def transducer_greedy_decode(model, params, feats, feat_lengths,
                             max_tokens: int = 200,
                             max_symbols_per_frame: int = 4,
                             return_times: bool = False):
    """Batched offline greedy decode: -> (tokens [B, max_tokens]
    (-1 padded), lengths [B] [, emission frame indices with
    return_times])."""
    enc_out, enc_lengths = model.apply(params, feats, feat_lengths,
                                       method="encode")
    f = model.apply(params, enc_out, method="enc_features")  # [B, T, dj]
    n_valid = jnp.maximum(
        jnp.where(feat_lengths > 0, enc_lengths, 0), 0)
    state = greedy_init(model, params, f.shape[0], max_tokens)
    state = greedy_advance(model, params, f, n_valid, state,
                           max_symbols_per_frame)
    if return_times:
        return (state["tokens"], state["u"], state["times"],
                state["confs"])
    return state["tokens"], state["u"]


def transducer_beam_search(model, params, feats, feat_lengths,
                           beam: int = 5, max_tokens: int = 200,
                           label_cand: int = 0,
                           length_penalty: float = 0.0,
                           lm=None, lm_params=None,
                           lm_weight: float = 0.0):
    """Alignment-length-synchronous transducer beam search, fully compiled.

    ALSD (Saon et al., arXiv:2005.03271 family): every live hypothesis has
    consumed the same number of alignment steps (t + u), so one
    `lax.while_loop` iteration expands the WHOLE [B, W] beam front by one
    step — each hypothesis proposes {blank (t+1)} + {top-K labels (u+1)}
    scored by the joint at its own (t, u); the per-utterance top-W of the
    W*(K+1) candidates survive. A hypothesis completes when its frame
    pointer crosses its encoder length (its last blank IS the terminal
    blank), after which it holds at fixed score.

    Recombination: two hypotheses with the same label sequence and the
    same frame pointer have identical futures, so their posterior mass is
    merged (logaddexp) into one beam slot each iteration — without it the
    probability of a label sequence splits across its alignments and the
    beam consistently loses to greedy. Completed hypotheses recombine on
    the label sequence alone. Exact: the merged slot's state (predictor
    cache, tokens) is shared by construction.

    Per-beam predictor KV caches ride the loop state flattened to
    [B*W, ...] and are beam-reordered with the same one-hot MXU
    permutation trick as decode/beam.py (take_along_axis inside a loop
    lowers to W-way select chains on TPU).

    Optional shallow fusion (lm/lm_params/lm_weight, espnet convention,
    mirroring decode/beam.py): label extensions score
    += lm_weight * logP_lm(token | history); blank transitions carry no LM
    term. The external TransformerLM advances via its per-row-position
    cached ``step_at`` only on emitting rows, its KV caches riding the
    same carry/reorder machinery as the predictor's.

    Returns dict(tokens [B, W, max_tokens] (-1 padded), lengths [B, W],
    scores [B, W]) sorted best-first; beam=1 equals greedy decode
    (tested) when the greedy per-frame emission cap is not binding.
    """
    from tpu_asr.ops.topk import exact_top_k

    enc_out, enc_lengths = model.apply(params, feats, feat_lengths,
                                       method="encode")
    f = model.apply(params, enc_out, method="enc_features")  # [B, T, dj]
    b, t_max, dj = f.shape
    w = beam
    n = b * w
    sos = model.cfg.vocab_size - 2
    blank = 0
    k = label_cand or min(w, model.cfg.vocab_size - 1)
    neg_inf = -1e30
    t_len = jnp.maximum(jnp.where(feat_lengths > 0, enc_lengths, 0), 0)
    t_len_flat = jnp.repeat(t_len, w, axis=0)                 # [N]
    b_rows = jnp.repeat(jnp.arange(b), w)                     # [N]
    rows = jnp.arange(n)

    cache0 = model.apply(params, n, max_tokens + 1,
                         method="predictor_init_cache")
    g0, cache0 = model.apply(
        params, jnp.full((n,), sos, jnp.int32), jnp.zeros((n,), jnp.int32),
        cache0, method="predictor_step")

    use_lm = lm is not None and lm_weight > 0.0
    if use_lm:
        lm_cache0 = lm.apply(lm_params, n, max_tokens + 1,
                             method=type(lm).init_cache)
        lm_logits0, lm_cache0 = lm.apply(
            lm_params, jnp.full((n,), sos, jnp.int32),
            jnp.zeros((n,), jnp.int32), lm_cache0,
            method=type(lm).step_at)
        lm_logp0 = jax.nn.log_softmax(lm_logits0.astype(jnp.float32),
                                      axis=-1)
    else:
        lm_cache0, lm_logp0 = (), jnp.zeros((n, 1), jnp.float32)

    def gather_beams(tree, beam_idx):
        """Reorder [N, ...] leaves by per-batch beam indices [B, W]."""
        perm = jax.nn.one_hot(beam_idx, w, axis=-1)           # [B, W, W]

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

    state0 = dict(
        t=jnp.zeros((n,), jnp.int32),
        u=jnp.zeros((n,), jnp.int32),
        done=(t_len_flat == 0),
        scores=jnp.tile(jnp.where(jnp.arange(w)[None, :] == 0, 0.0,
                                  neg_inf), (b, 1)),          # [B, W]
        tokens=jnp.full((n, max_tokens), -1, jnp.int32),
        g=g0,
        cache=cache0,
        lm_logp=lm_logp0,
        lm_cache=lm_cache0,
    )

    def cond(st):
        return jnp.any(~st["done"])

    def body(st):
        t, u, done = st["t"], st["u"], st["done"]
        f_t = f[b_rows, jnp.clip(t, 0, t_max - 1)]            # [N, dj]
        logits = model.apply(params, f_t, st["g"],
                             method="joint_step")             # [N, V]
        logp = jax.nn.log_softmax(logits, axis=-1)
        blank_lp = logp[:, blank]
        label_lp = logp.at[:, blank].set(neg_inf)
        # sos/eos are not transducer output symbols
        label_lp = label_lp.at[:, model.cfg.vocab_size - 2:].set(neg_inf)
        if use_lm:
            # shallow fusion reweights the label scores BEFORE candidate
            # selection (the acoustic-only top-K could exclude the
            # LM-preferred token at char vocabularies)
            label_lp = label_lp + lm_weight * st["lm_logp"]
        cand_lp, cand_ids = exact_top_k(label_lp, k)          # [N, K]
        # candidate slot 0 = blank/hold, 1..K = label extensions
        at_cap = u >= max_tokens
        step_score = jnp.concatenate(
            [jnp.where(done, 0.0, blank_lp)[:, None],
             jnp.where((done | at_cap)[:, None], neg_inf, cand_lp)],
            axis=1)                                           # [N, K+1]
        cand = st["scores"].reshape(n)[:, None] + step_score
        top_scores, top_idx = exact_top_k(cand.reshape(b, w * (k + 1)), w)
        beam_idx = top_idx // (k + 1)                         # [B, W]
        slot_idx = (top_idx % (k + 1)).reshape(n)             # [N]

        # reorder all per-beam state to the winners' source beams
        flat_beam = (jnp.arange(b)[:, None] * w + beam_idx).reshape(n)
        small = dict(t=t, u=u, done=done, tokens=st["tokens"], g=st["g"])
        small = {kk: vv[flat_beam] for kk, vv in small.items()}
        cache = gather_beams(st["cache"], beam_idx)
        lm_cache = (gather_beams(st["lm_cache"], beam_idx) if use_lm
                    else st["lm_cache"])
        lm_logp = (gather_beams(st["lm_logp"], beam_idx) if use_lm
                   else st["lm_logp"])
        t_g, u_g, done_g = small["t"], small["u"], small["done"]

        emit = (slot_idx > 0) & ~done_g
        tok = jnp.take_along_axis(
            cand_ids[flat_beam],
            jnp.maximum(slot_idx - 1, 0)[:, None], axis=1)[:, 0]
        u_clip = jnp.clip(u_g, 0, max_tokens - 1)
        tokens = small["tokens"].at[rows, u_clip].set(
            jnp.where(emit, tok, small["tokens"][rows, u_clip]))

        k_safe = jnp.where(emit, tok, sos)
        g_new, cache_new = model.apply(
            params, k_safe, jnp.minimum(u_g + 1, max_tokens), cache,
            method="predictor_step")
        emit_select = lambda new, old: jnp.where(
            emit.reshape((n,) + (1,) * (old.ndim - 1)), new, old)
        g = jnp.where(emit[:, None], g_new, small["g"])
        cache = jax.tree.map(emit_select, cache_new, cache)
        if use_lm:
            lm_logits_new, lm_cache_new = lm.apply(
                lm_params, k_safe, jnp.minimum(u_g + 1, max_tokens),
                lm_cache, method=type(lm).step_at)
            lm_logp_new = jax.nn.log_softmax(
                lm_logits_new.astype(jnp.float32), axis=-1)
            lm_logp = jnp.where(emit[:, None], lm_logp_new, lm_logp)
            lm_cache = jax.tree.map(emit_select, lm_cache_new, lm_cache)

        take_blank = (slot_idx == 0) & ~done_g
        t_new = jnp.where(take_blank, t_g + 1, t_g)
        u_new = jnp.where(emit, u_g + 1, u_g)
        done_new = done_g | (t_new >= t_len_flat)

        # (y, t) recombination: same label sequence + same frame pointer
        # (done rows: same label sequence) => identical future. Merge
        # posterior mass into the first such slot; duplicates drop to
        # -inf and fall off at the next top-W.
        tok_b = tokens.reshape(b, w, max_tokens)
        t_key = jnp.where(done_new, -1, t_new).reshape(b, w)
        u_b = u_new.reshape(b, w)
        same = ((tok_b[:, :, None, :] == tok_b[:, None, :, :]).all(-1)
                & (t_key[:, :, None] == t_key[:, None, :])
                & (u_b[:, :, None] == u_b[:, None, :]))       # [B, W, W]
        canon = jnp.argmax(same, axis=2)                      # first equal
        is_canon = canon == jnp.arange(w)[None, :]
        merged = jax.nn.logsumexp(
            jnp.where(same, top_scores[:, None, :], neg_inf), axis=2)
        scores_new = jnp.where(is_canon, merged, neg_inf)

        return dict(
            t=t_new,
            u=u_new,
            done=done_new,
            scores=scores_new,
            tokens=tokens, g=g, cache=cache,
            lm_logp=lm_logp, lm_cache=lm_cache)

    final = jax.lax.while_loop(cond, body, state0)
    lengths = final["u"].reshape(b, w)
    scores = (final["scores"]
              + length_penalty * lengths.astype(jnp.float32))
    order = jnp.argsort(-scores, axis=1)
    tokens = final["tokens"].reshape(b, w, max_tokens)
    return {
        "tokens": jnp.take_along_axis(tokens, order[..., None], axis=1),
        "scores": jnp.take_along_axis(scores, order, axis=1),
        "lengths": jnp.take_along_axis(lengths, order, axis=1),
    }


def transducer_rescore(model, params, feats, feat_lengths,
                       beam: int = 10, max_len: int = 64,
                       ctc_weight: float = 0.5, ctc_topk: int = 8):
    """Two-pass transducer decode: CTC prefix-beam n-best (from the aux
    CTC head) rescored by the EXACT transducer marginal log P(y|x).

    The transducer analog of decode/rescore.py's attention rescoring, and
    the most TPU-friendly transducer decode shape available: pass 2 has no
    autoregressive loop at all — one teacher-forced predictor pass over
    all B*W hypotheses, then the frame-fused lattice scan
    (ops/transducer.py) evaluates each hypothesis' full marginal
    (all alignments, not a single greedy path) in one compiled program.

    final score = -NLL_rnnt + ctc_weight * logP_ctc (WeNet-style ranking,
    matching attention_rescore's convention). Requires the aux CTC head
    (cfg.ctc_weight > 0 at training time).

    -> dict(tokens [B, W, L] (-1-padded), scores [B, W], lengths [B, W])
    sorted best-first.
    """
    from tpu_asr.decode.ctc_beam import ctc_prefix_beam_search
    from tpu_asr.ops.transducer import transducer_loss

    neg_inf = -1e30
    enc_out, enc_lengths = model.apply(params, feats, feat_lengths,
                                       method="encode")
    enc_lengths = jnp.maximum(
        jnp.where(feat_lengths > 0, enc_lengths, 0), 0)
    ctc_logits = model.apply(params, enc_out, method="ctc_logits")
    b, t, _ = enc_out.shape
    w = beam
    l = min(max_len, ctc_logits.shape[1])
    toks, lens, ctc_scores = ctc_prefix_beam_search(
        ctc_logits, enc_lengths, beam=w, topk=ctc_topk, max_len=l)

    n = b * w
    toks_f = toks.reshape(n, l)
    lens_f = lens.reshape(n)
    safe = jnp.where(toks_f >= 0, toks_f, 0)
    sos = model.cfg.vocab_size - 2
    ys_in = jnp.concatenate(
        [jnp.full((n, 1), sos, jnp.int32), safe], axis=1)     # [N, L+1]
    g = model.apply(params, ys_in, method="predict_sequence")
    f = model.apply(params, enc_out, method="enc_features")
    f_tiled = jnp.repeat(f, w, axis=0)
    el_tiled = jnp.repeat(enc_lengths, w, axis=0)
    p = params["params"] if "params" in params else params
    nll = transducer_loss(
        f_tiled, g, p["joint_out_kernel"].astype(model.cfg.dtype),
        p["joint_out_bias"].astype(jnp.float32), safe, el_tiled, lens_f,
        blank=0, reduction="none")                            # [N]
    rnnt_score = (-nll).reshape(b, w)
    final = rnnt_score + ctc_weight * ctc_scores
    final = jnp.where(ctc_scores <= neg_inf / 2, neg_inf, final)
    order = jnp.argsort(-final, axis=1)
    return {
        "tokens": jnp.take_along_axis(toks, order[..., None], axis=1),
        "scores": jnp.take_along_axis(final, order, axis=1),
        "lengths": jnp.take_along_axis(lens, order, axis=1),
        "rnnt_scores": jnp.take_along_axis(rnnt_score, order, axis=1),
        "ctc_scores": jnp.take_along_axis(ctc_scores, order, axis=1),
    }
