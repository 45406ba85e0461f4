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
        g=g0,
        cache=cache,
    )


def greedy_advance(model, params, f, n_valid, state,
                   max_symbols_per_frame: int = 4):
    """Consume frames f[:, :n_valid] (per row), extending the search state.

    f: [B, Tc, d_joint] encoder-side joint features; n_valid: [B] valid
    frame counts within f. Each call starts at local frame 0 — the caller
    slices f to the not-yet-consumed frames (a chunk, or the whole
    utterance). Returns the advanced state.
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
            tokens=tokens, g=g, cache=cache)

    final = jax.lax.while_loop(cond, body, state)
    final.pop("t")
    final.pop("emitted")
    return final


def transducer_greedy_decode(model, params, feats, feat_lengths,
                             max_tokens: int = 200,
                             max_symbols_per_frame: int = 4):
    """Batched offline greedy decode: -> (tokens [B, max_tokens]
    (-1 padded), lengths [B])."""
    enc_out, enc_lengths = model.apply(params, feats, feat_lengths,
                                       method="encode")
    f = model.apply(params, enc_out, method="enc_features")  # [B, T, dj]
    n_valid = jnp.maximum(
        jnp.where(feat_lengths > 0, enc_lengths, 0), 0)
    state = greedy_init(model, params, f.shape[0], max_tokens)
    state = greedy_advance(model, params, f, n_valid, state,
                           max_symbols_per_frame)
    return state["tokens"], state["u"]
