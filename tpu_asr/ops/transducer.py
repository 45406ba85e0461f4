"""RNN-T (transducer) loss, pure JAX — beyond-reference model family.

The reference repo (SURVEY.md section 2) covers CTC, attention, hybrid and
CIF objectives; a neural transducer (Graves 2012, arXiv:1211.3711) is the
natural fourth member — frame-synchronous like CTC but with a label-history
predictor — and the standard production streaming-ASR objective
(Transformer-Transducer, PAPERS.md / arXiv:2002.02562). It composes with
this repo's chunk-masked streaming encoder unchanged.

TPU-first design, two levels:

* `transducer_forward` — the alpha recursion over the (T, U) lattice given
  per-node blank/emit log-probs. The within-row recurrence
  ``a[u] = logaddexp(below[u], a[u-1] + emit[u-1])`` is a linear recurrence
  in the log semiring, evaluated with `lax.associative_scan` (log2(U) vector
  steps on the VPU) instead of a sequential U-loop; rows advance with one
  `lax.scan` over T.

* `transducer_loss` — the memory-critical path. The naive formulation
  materializes joint logits [B, T, U+1, V] (~2.7 GB bf16 at the flagship
  shape b=32 x T'=250 x U=40 x V=4233). Here the joint network
  ``logits = act(f_t + g) @ w_out + b_out`` is computed ONE FRAME AT A TIME
  inside the lattice scan and the step is `jax.checkpoint`-ed, so backward
  rematerializes each frame's [B, U+1, V] logits instead of storing T of
  them: peak memory drops from O(T*U*V) to O(U*V) per batch row while the
  per-frame [B*(U+1), H] x [H, V] GEMM stays MXU-sized.

Conventions match ops/ctc.py: blank id 0, lengths mask padded frames and
labels, f32 lattice numerics, `reduction='mean_label'` equals
torch(reduction='mean') semantics. Oracle-tested against brute-force
alignment enumeration and a torch autograd twin (tests/unit and
tests/parity).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _row_scan(below: jnp.ndarray, emit: jnp.ndarray) -> jnp.ndarray:
    """Solve a[u] = logaddexp(below[u], a[u-1] + emit_shift[u]) over u.

    below: [B, U1]; emit: [B, U] (emit[u] joins row position u -> u+1).
    Returns a [B, U1]. Implemented as an associative scan over affine maps
    in the log semiring: element (c, b) represents a -> logaddexp(b, a + c);
    (c1,b1) then (c2,b2) composes to (c1+c2, logaddexp(b2, b1+c2)).
    """
    b_, u1 = below.shape
    c = jnp.concatenate([jnp.full((b_, 1), NEG_INF, below.dtype),
                         emit], axis=1)                       # [B, U1]

    def combine(lhs, rhs):
        c1, b1 = lhs
        c2, b2 = rhs
        return c1 + c2, jnp.logaddexp(b2, b1 + c2)

    # a[-1] is -inf, so the composed constant term alone is the answer.
    _, a = jax.lax.associative_scan(combine, (c, below), axis=1)
    return a


def transducer_forward(
    blank_lp: jnp.ndarray,
    emit_lp: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Alpha recursion given per-node log-probs; returns per-utt NLL [B].

    blank_lp: [B, T, U1] log P(blank | t, u);  emit_lp: [B, T, U]
    log P(y_{u+1} | t, u). Lattice: alpha[t,u] = logaddexp(
    alpha[t-1,u] + blank[t-1,u], alpha[t,u-1] + emit[t,u-1]);
    log-lik = alpha[T-1, U] + blank[T-1, U] per true lengths.
    """
    b, t, u1 = blank_lp.shape
    u_pos = jnp.arange(u1)[None, :]
    # Labels beyond the true length can never be consumed.
    label_valid = u_pos[:, : u1 - 1] < label_lengths[:, None]    # [B, U]
    emit_lp = jnp.where(label_valid[:, None, :], emit_lp, NEG_INF)

    below0 = jnp.where(u_pos == 0, 0.0, NEG_INF).astype(jnp.float32)
    below0 = jnp.broadcast_to(below0, (b, u1))

    def step(carry, inputs):
        below, ll = carry
        blank_t, emit_t, t_idx = inputs
        alpha = _row_scan(below, emit_t)                      # [B, U1]
        # Read out the terminal node on each utterance's last frame.
        final_here = jnp.take_along_axis(
            alpha + blank_t, label_lengths[:, None], axis=1)[:, 0]
        ll = jnp.where(t_idx == logit_lengths - 1, final_here, ll)
        below_next = alpha + blank_t
        # Freeze past the utterance end (keeps shapes static).
        active = (t_idx < logit_lengths - 1)[:, None]
        below_next = jnp.where(active, below_next, below)
        return (below_next, ll), None

    (_, ll), _ = jax.lax.scan(
        step, (below0, jnp.full((b,), NEG_INF)),
        (jnp.moveaxis(blank_lp, 1, 0), jnp.moveaxis(emit_lp, 1, 0),
         jnp.arange(t)))
    return -ll


def joint_log_probs(f_t, g, w_out, b_out, labels, blank: int,
                    act=jnp.tanh):
    """One frame's joint-network blank/emit log-probs.

    f_t: [B, H] encoder projection at frame t; g: [B, U1, H] predictor
    projections; w_out [H, V], b_out [V]. Returns (blank_lp [B, U1],
    emit_lp [B, U]) in f32. Emit gathers ride a one-hot MXU einsum (TPU
    vocab-axis gathers are slow; ops/ctc.py measured ~5x).
    """
    joint = act(f_t[:, None, :] + g)                          # [B, U1, H]
    logits = (jnp.einsum("buh,hv->buv", joint, w_out)
              + b_out).astype(jnp.float32)                    # [B, U1, V]
    lse = jax.nn.logsumexp(logits, axis=-1)                   # [B, U1]
    blank_lp = logits[..., blank] - lse
    v = logits.shape[-1]
    onehot = (labels[:, :, None] == jnp.arange(v)[None, None, :]).astype(
        logits.dtype)                                         # [B, U, V]
    emit = jnp.einsum("buv,buv->bu", logits[:, :-1], onehot,
                      precision=jax.lax.Precision.HIGHEST)
    return blank_lp, emit - lse[:, :-1]


def transducer_forward_fused(
    f: jnp.ndarray,
    g: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    labels: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    act=jnp.tanh,
) -> jnp.ndarray:
    """NLL [B] with the joint network fused into the lattice scan.

    f: [B, T, H] (encoder side, pre-activation); g: [B, U1, H] (predictor
    side, row u = history y_1..y_u); w_out/b_out: joint output projection.
    Each scan step computes one frame's [B, U1, V] logits, reduces them to
    blank/emit log-probs, and advances the alpha row; `jax.checkpoint` on
    the step keeps backward memory at one frame's logits.
    """
    b, t, _ = f.shape
    u1 = g.shape[1]
    u_pos = jnp.arange(u1 - 1)[None, :]
    label_valid = u_pos < label_lengths[:, None]              # [B, U]

    below0 = jnp.where(jnp.arange(u1)[None, :] == 0, 0.0, NEG_INF)
    below0 = jnp.broadcast_to(below0.astype(jnp.float32), (b, u1))

    @jax.checkpoint
    def step(carry, inputs):
        below, ll = carry
        f_t, t_idx = inputs
        blank_t, emit_t = joint_log_probs(f_t, g, w_out, b_out, labels,
                                          blank, act)
        emit_t = jnp.where(label_valid, emit_t, NEG_INF)
        alpha = _row_scan(below, emit_t)
        final_here = jnp.take_along_axis(
            alpha + blank_t, label_lengths[:, None], axis=1)[:, 0]
        ll = jnp.where(t_idx == logit_lengths - 1, final_here, ll)
        below_next = alpha + blank_t
        active = (t_idx < logit_lengths - 1)[:, None]
        below_next = jnp.where(active, below_next, below)
        return (below_next, ll), None

    (_, ll), _ = jax.lax.scan(
        step, (below0, jnp.full((b,), NEG_INF)),
        (jnp.moveaxis(f, 1, 0), jnp.arange(t)))
    return -ll


def transducer_loss(
    f: jnp.ndarray,
    g: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    labels: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "mean_label",
    act=jnp.tanh,
) -> jnp.ndarray:
    """Transducer NLL with reductions (see transducer_forward_fused).

    Dummy rows (logit_lengths == 0, the static-batch loader's padding
    convention) contribute 0, like ops/ctc.py's zero_infinity handling.
    """
    nll = transducer_forward_fused(f, g, w_out, b_out, labels,
                                   logit_lengths, label_lengths, blank, act)
    feasible = logit_lengths > 0
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


def transducer_loss_from_logits(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "none",
) -> jnp.ndarray:
    """NLL from fully materialized joint logits [B, T, U1, V].

    Test/oracle path (and fine for tiny models): normalizes per node and
    feeds the same alpha recursion the fused path uses.
    """
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank_lp = lp[..., blank]                                 # [B, T, U1]
    u = labels.shape[1]
    emit_lp = jnp.take_along_axis(
        lp[:, :, :u, :],
        labels[:, None, :, None].astype(jnp.int32), axis=-1)[..., 0]
    nll = transducer_forward(blank_lp, emit_lp, logit_lengths, label_lengths)
    feasible = logit_lengths > 0
    nll = jnp.where(feasible & (nll < -NEG_INF / 2), nll, 0.0)
    if reduction == "none":
        return nll
    if reduction == "mean_label":
        return jnp.mean(nll / jnp.maximum(label_lengths, 1))
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    raise ValueError(f"unknown reduction {reduction!r}")
