"""Transducer greedy decode — one compiled frame-synchronous while_loop.

The classic RNN-T greedy loop (Graves, arXiv:1211.3711 fig.; also the
reference family's per-utterance host loops, SURVEY.md 3.2) advances a
(frame t, label count u) pointer pair per utterance: argmax the joint at
(t, u); blank consumes the frame, a label extends the history and re-runs
the predictor. Host-driven, that is one device round-trip per step.

TPU-first redesign: the WHOLE batch advances inside one
`lax.while_loop` — every row carries its own (t, u, emitted-this-frame)
state, the predictor's cached step runs batched with per-row positions
(models/transducer.py Predictor.step), and rows that advance their frame
simply keep their predictor output (a `where` select). The loop runs until
every row has consumed its encoder frames; iteration count is bounded by
max(T) + max_tokens, every shape static. Hypotheses are bit-identical to
the per-utterance host loop (tested in tests/unit/test_transducer_model.py).

max_symbols_per_frame caps label emissions per frame (standard guard
against degenerate non-blank loops early in training).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transducer_greedy_decode(model, params, feats, feat_lengths,
                             max_tokens: int = 200,
                             max_symbols_per_frame: int = 4):
    """Batched greedy decode: -> (tokens [B, max_tokens] (-1 padded),
    lengths [B])."""
    enc_out, enc_lengths = model.apply(params, feats, feat_lengths,
                                       method="encode")
    f = model.apply(params, enc_out, method="enc_features")  # [B, T, dj]
    b, t_max, _ = f.shape
    enc_lengths = jnp.maximum(
        jnp.where(feat_lengths > 0, enc_lengths, 0), 0)
    sos = model.cfg.vocab_size - 2
    blank = 0
    rows = jnp.arange(b)

    cache0 = model.apply(params, b, max_tokens + 1,
                         method="predictor_init_cache")
    g0, cache0 = model.apply(
        params, jnp.full((b,), sos, jnp.int32), jnp.zeros((b,), jnp.int32),
        cache0, method="predictor_step")

    state0 = dict(
        t=jnp.zeros((b,), jnp.int32),
        u=jnp.zeros((b,), jnp.int32),
        emitted=jnp.zeros((b,), jnp.int32),
        tokens=jnp.full((b, max_tokens), -1, jnp.int32),
        g=g0,
        cache=cache0,
    )

    def cond(state):
        return jnp.any(state["t"] < enc_lengths)

    def body(state):
        t, u = state["t"], state["u"]
        f_t = f[rows, jnp.clip(t, 0, t_max - 1)]              # [B, dj]
        logits = model.apply(params, f_t, state["g"],
                             method="joint_step")             # [B, V]
        k = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        active = t < enc_lengths
        emit = active & (k != blank) & (u < max_tokens) & \
            (state["emitted"] < max_symbols_per_frame)
        u_clip = jnp.clip(u, 0, max_tokens - 1)
        cur = state["tokens"][rows, u_clip]
        tokens = state["tokens"].at[rows, u_clip].set(
            jnp.where(emit, k, cur))
        # Predictor advances only on emit rows; the step itself runs
        # batched (one program), non-emit rows keep g and cache.
        k_safe = jnp.where(emit, k, sos)
        g_new, cache_new = model.apply(
            params, k_safe, jnp.minimum(u + 1, max_tokens), state["cache"],
            method="predictor_step")
        g = jnp.where(emit[:, None], g_new, state["g"])
        cache = jax.tree.map(
            lambda new, old: jnp.where(
                emit.reshape((b,) + (1,) * (old.ndim - 1)), new, old),
            cache_new, state["cache"])
        # blank (or cap) consumes the frame; a label stays on it.
        advance = active & ~emit
        return dict(
            t=jnp.where(advance, t + 1, t),
            u=jnp.where(emit, u + 1, u),
            emitted=jnp.where(emit, state["emitted"] + 1,
                              jnp.where(advance, 0, state["emitted"])),
            tokens=tokens, g=g, cache=cache)

    final = jax.lax.while_loop(cond, body, state0)
    return final["tokens"], final["u"]
