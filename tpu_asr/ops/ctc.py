"""CTC loss and greedy collapse, pure JAX (log-space scan over the lattice).

TPU-native replacement for the reference's `torch.nn.CTCLoss` (cuDNN/native
C++; reference: CTC model file wraps nn.CTCLoss with log_softmax inputs,
blank id, zero_infinity). Static-shape alpha recursion over an interleaved
blank/label lattice of width S = 2*U_max+1, scanned over T under jit; grads
come from JAX autodiff through the scan. A Pallas forward-backward kernel
(tpu_asr.ops.pallas.ctc) overrides this on TPU for speed; this module is the
numerical reference it is tested against (and against torch-CPU CTCLoss).

Conventions: logits [B, T, V] unnormalized; labels [B, U] padded with any id
(masked by label_lengths); blank defaults to 0 (tpu_asr.utils.vocab layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def _interleave_blanks(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """[B, U] -> [B, 2U+1] lattice symbols: blank, l1, blank, l2, ..., blank."""
    b, u = labels.shape
    z = jnp.full((b, 2 * u + 1), blank, dtype=labels.dtype)
    return z.at[:, 1::2].set(labels)


def gather_emissions(log_probs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """E[b,t,s] = log_probs[b,t,z[b,s]] via a one-hot MXU matmul.

    TPU gathers along the vocab axis are ~5x slower than this einsum (and
    its autodiff transpose gives the scatter-add for free on the MXU);
    HIGHEST precision makes the selection exact.
    """
    v = log_probs.shape[-1]
    onehot = (z[:, :, None] == jnp.arange(v)[None, None, :]).astype(
        log_probs.dtype)
    return jnp.einsum("btv,bsv->bts", log_probs, onehot,
                      precision=jax.lax.Precision.HIGHEST)


def lattice_emissions(logits: jnp.ndarray, z: jnp.ndarray,
                      log_input: bool) -> jnp.ndarray:
    """E[b,t,s] = log_softmax(logits)[b,t,z_s] WITHOUT materializing the
    full [B,T,V] log-prob tensor: gather the raw logits for the S lattice
    symbols (one-hot MXU einsum) and subtract the per-frame logsumexp (a
    fused reduce). For d512/V=4233 the avoided f32 [B,T,V] round-trip is
    ~270MB of HBM traffic per step."""
    if log_input:
        return gather_emissions(logits.astype(jnp.float32), z)
    gathered = gather_emissions(logits, z).astype(jnp.float32)
    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    return gathered - lse[:, :, None]


def ctc_forward_alphas(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    log_input: bool = True,
):
    """Run the alpha recursion; returns (final per-utt neg-log-like [B]).

    log_probs: [B, T, V] log-softmaxed (or raw logits with
    log_input=False — normalized on the fly via lattice_emissions).
    """
    b, t, v = log_probs.shape
    u = labels.shape[1]
    s = 2 * u + 1
    z = _interleave_blanks(labels, blank)                       # [B, S]
    # Transition legality: from s-2 allowed iff z_s != blank and z_s != z_{s-2}.
    z_shift2 = jnp.concatenate(
        [jnp.full((b, 2), blank, dtype=z.dtype), z[:, :-2]], axis=1)
    allow_skip = (z != blank) & (z != z_shift2)                  # [B, S]
    allow_skip = allow_skip.at[:, :2].set(False)
    s_pos = jnp.arange(s)[None, :]
    # Lattice positions beyond 2*label_len are invalid (labels padded short).
    valid_s = s_pos <= 2 * label_lengths[:, None]

    # Emission log-probs per lattice position, gathered ONCE up front:
    # E [B, T, S] is ~30x smaller than log_probs for char vocabs, so the
    # sequential scan only touches small arrays (same trick feeds the
    # Pallas kernel).
    emissions = lattice_emissions(log_probs, z, log_input)       # [B, T, S]

    alpha0 = jnp.full((b, s), NEG_INF)
    emit0 = emissions[:, 0]
    alpha0 = alpha0.at[:, 0].set(emit0[:, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(label_lengths > 0, emit0[:, 1], NEG_INF))

    def step(alpha, inputs):
        emit, t_idx = inputs                                     # [B, S]
        a_prev = alpha
        a_shift1 = jnp.concatenate(
            [jnp.full((b, 1), NEG_INF), alpha[:, :-1]], axis=1)
        a_shift2 = jnp.concatenate(
            [jnp.full((b, 2), NEG_INF), alpha[:, :-2]], axis=1)
        a_shift2 = jnp.where(allow_skip, a_shift2, NEG_INF)
        stacked = jnp.stack([a_prev, a_shift1, a_shift2], axis=0)
        new = jax.nn.logsumexp(stacked, axis=0) + emit
        new = jnp.where(valid_s, new, NEG_INF)
        # Frozen past the utterance end so the final read-out is correct.
        active = (t_idx < logit_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    ts = jnp.arange(1, t)
    alpha_final, _ = jax.lax.scan(
        step, alpha0, (jnp.moveaxis(emissions[:, 1:], 1, 0), ts))

    end = 2 * label_lengths                                      # [B]
    last = jnp.take_along_axis(alpha_final, end[:, None], axis=1)[:, 0]
    last_m1 = jnp.take_along_axis(
        alpha_final, jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0]
    last_m1 = jnp.where(label_lengths > 0, last_m1, NEG_INF)
    ll = jnp.logaddexp(last, last_m1)
    return -ll


def ctc_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "mean_label",
    log_input: bool = False,
) -> jnp.ndarray:
    """CTC negative log-likelihood.

    reduction: 'mean_label' matches torch.nn.CTCLoss(reduction='mean')
    (per-utt NLL / label_length, averaged over batch); 'mean' averages raw
    per-utt NLLs; 'sum' and 'none' as usual. Infeasible utterances
    (logit_len < label span) get 0 loss, like zero_infinity=True.
    """
    nll = ctc_forward_alphas(logits, labels, logit_lengths,
                             label_lengths, blank, log_input=log_input)
    # zero_infinity: repeats need a blank between them; min span check.
    feasible = logit_lengths >= label_lengths
    nll = jnp.where(feasible & (nll < -NEG_INF / 2), nll, 0.0)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "mean_label":
        return jnp.mean(nll / jnp.maximum(label_lengths, 1))
    raise ValueError(f"unknown reduction {reduction!r}")


def ctc_greedy_collapse(
    ids: jnp.ndarray,
    lengths: jnp.ndarray,
    blank: int = 0,
    pad_id: int = -1,
    return_times: bool = False,
):
    """Greedy CTC decode collapse, vectorized (no host loop).

    ids: [B, T] argmax frame labels; lengths: [B] valid frames.
    Collapses repeats, removes blanks, left-packs the survivors. Returns
    (tokens [B, T] padded with pad_id, token_lengths [B]); with
    return_times also the emission frame index of each token (the first
    frame of its run, -1 padded) — token timestamps for
    subtitling/alignment (frame -> seconds is the caller's subsampling
    factor x frame shift).

    Reference behavior: CTC greedy decode = argmax -> collapse repeats ->
    drop blanks (reference: recognize path of the CTC model).
    """
    b, t = ids.shape
    prev = jnp.concatenate(
        [jnp.full((b, 1), -12345, dtype=ids.dtype), ids[:, :-1]], axis=1)
    valid = (ids != blank) & (ids != prev) & (
        jnp.arange(t)[None, :] < lengths[:, None])
    # Left-pack via sort: position key = index where valid else T (stable sort).
    pos = jnp.where(valid, jnp.arange(t)[None, :], t)
    order = jnp.argsort(pos, axis=1)
    packed = jnp.take_along_axis(ids, order, axis=1)
    n = jnp.sum(valid, axis=1)
    keep = jnp.arange(t)[None, :] < n[:, None]
    packed = jnp.where(keep, packed, pad_id)
    if not return_times:
        return packed, n
    times = jnp.where(keep, jnp.take_along_axis(pos, order, axis=1), -1)
    return packed, n, times


def ctc_viterbi_align(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    log_input: bool = False,
):
    """CTC forced alignment: the Viterbi (best) path through the
    interleaved blank/label lattice, as per-token frame spans.

    -> (starts [B, U], ends [B, U]) — first/last frame assigned to each
    label state on the best path (inclusive; -1 past label_lengths).
    The max-product recursion mirrors ctc_forward_alphas' sum-product,
    with int8 backpointers stacked by the scan; the backtrace is a small
    host loop over [T, S] (production forced-alignment shape: one
    utterance batch at a time is fine, but this is fully batched anyway).

    Oracle-tested against brute-force best-alignment enumeration
    (tests/unit/test_align.py).
    """
    b, t, v = logits.shape
    u = labels.shape[1]
    s = 2 * u + 1
    z = _interleave_blanks(labels, blank)
    z_shift2 = jnp.concatenate(
        [jnp.full((b, 2), blank, dtype=z.dtype), z[:, :-2]], axis=1)
    allow_skip = (z != blank) & (z != z_shift2)
    allow_skip = allow_skip.at[:, :2].set(False)
    valid_s = jnp.arange(s)[None, :] <= 2 * label_lengths[:, None]

    emissions = lattice_emissions(logits, z, log_input)       # [B, T, S]

    delta0 = jnp.full((b, s), NEG_INF)
    delta0 = delta0.at[:, 0].set(emissions[:, 0, 0])
    delta0 = delta0.at[:, 1].set(
        jnp.where(label_lengths > 0, emissions[:, 0, 1], NEG_INF))

    def step(delta, inputs):
        emit, t_idx = inputs
        d_stay = delta
        d_prev = jnp.concatenate(
            [jnp.full((b, 1), NEG_INF), delta[:, :-1]], axis=1)
        d_skip = jnp.concatenate(
            [jnp.full((b, 2), NEG_INF), delta[:, :-2]], axis=1)
        d_skip = jnp.where(allow_skip, d_skip, NEG_INF)
        stacked = jnp.stack([d_stay, d_prev, d_skip], axis=0)  # [3, B, S]
        best = jnp.argmax(stacked, axis=0).astype(jnp.int8)
        new = jnp.max(stacked, axis=0) + emit
        new = jnp.where(valid_s, new, NEG_INF)
        active = (t_idx < logit_lengths)[:, None]
        return jnp.where(active, new, delta), \
            jnp.where(active, best, jnp.int8(0))

    ts = jnp.arange(1, t)
    delta_final, bps = jax.lax.scan(
        step, delta0, (jnp.moveaxis(emissions[:, 1:], 1, 0), ts))
    # terminal state: better of final blank / final label
    end_s = 2 * label_lengths
    d_end = jnp.take_along_axis(delta_final, end_s[:, None], axis=1)[:, 0]
    d_end_m1 = jnp.take_along_axis(
        delta_final, jnp.maximum(end_s - 1, 0)[:, None], axis=1)[:, 0]
    d_end_m1 = jnp.where(label_lengths > 0, d_end_m1, NEG_INF)
    last_state = jnp.where(d_end >= d_end_m1, end_s,
                           jnp.maximum(end_s - 1, 0))

    # host backtrace (bps: [T-1, B, S] int8)
    bps_np = np.asarray(bps)
    last_state_np = np.asarray(last_state)
    tl = np.asarray(logit_lengths)
    ul = np.asarray(label_lengths)
    starts = np.full((b, u), -1, np.int32)
    ends = np.full((b, u), -1, np.int32)
    for i in range(b):
        if tl[i] <= 0 or ul[i] <= 0:
            continue
        s_cur = int(last_state_np[i])
        for t_idx in range(int(tl[i]) - 1, -1, -1):
            if s_cur % 2 == 1:                       # label state
                tok = (s_cur - 1) // 2
                starts[i, tok] = t_idx
                if ends[i, tok] < 0:
                    ends[i, tok] = t_idx
            if t_idx > 0:
                s_cur -= int(bps_np[t_idx - 1, i, s_cur])
    return jnp.asarray(starts), jnp.asarray(ends)
