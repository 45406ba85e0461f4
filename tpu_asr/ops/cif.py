"""CIF — continuous integrate-and-fire — as MXU-friendly parallel math.

The reference implements CIF as a sequential Python loop over frames
(reference: src/models/cif_model.py, the accumulate-and-fire scan of the CIF
paper, Dong & Xu ICASSP 2020, arXiv:1905.11235):

    accum = 0; acc_vec = 0
    for t in 1..T:
        if accum + a_t < 1: accum += a_t; acc_vec += a_t*h_t
        else: a1 = 1-accum; FIRE(acc_vec + a1*h_t); accum = a_t-a1; acc_vec = accum*h_t

That loop is hostile to TPUs. The TPU-native reformulation used here: firing
boundaries are exactly the integer crossings of c = cumsum(alpha), and the
weight frame t contributes to output u is the overlap of the interval
[c_{t-1}, c_t] with [u, u+1]:

    w[t, u] = clip(min(c_t, u+1) - max(c_{t-1}, u), 0)

This reproduces the boundary-frame weight *splitting* of the sequential
algorithm exactly (including frames whose alpha spans multiple fires), and
the fired embeddings become one einsum  fired[u] = sum_t w[t,u] * h[t]  — a
[U, T] x [T, D] matmul on the MXU, fully parallel over batch/time, and
differentiable by plain autodiff (no custom VJP needed for correctness; the
Pallas kernel in tpu_asr.ops.pallas.cif tiles the same math).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scale_alphas(alphas: jnp.ndarray, valid_mask: jnp.ndarray,
                 target_lengths: jnp.ndarray) -> jnp.ndarray:
    """Training-time scaling: alpha <- alpha * U / sum(alpha) per utterance,
    so the number of fires equals the target length U (teacher forcing of
    fire count; reference trains CIF this way, per the CIF paper)."""
    alphas = jnp.where(valid_mask, alphas, 0.0)
    total = jnp.sum(alphas, axis=-1, keepdims=True)
    return alphas * (target_lengths[..., None] / jnp.maximum(total, 1e-6))


def quantity_loss(alphas: jnp.ndarray, valid_mask: jnp.ndarray,
                  target_lengths: jnp.ndarray,
                  row_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """| sum(alpha) - U | averaged over the batch (reference: CIF quantity
    loss on the *unscaled* alphas). row_valid masks dummy rows padded in
    by the static-batch loader."""
    total = jnp.sum(jnp.where(valid_mask, alphas, 0.0), axis=-1)
    per = jnp.abs(total - target_lengths.astype(total.dtype))
    if row_valid is None:
        return jnp.mean(per)
    n = jnp.maximum(jnp.sum(row_valid), 1)
    return jnp.sum(jnp.where(row_valid, per, 0.0)) / n


def cif_weights(alphas: jnp.ndarray, u_max: int) -> jnp.ndarray:
    """[B, T] fire weights -> [B, T, u_max] frame->output assignment matrix.

    w[b, t, u] = overlap of [c_{t-1}, c_t] with [u, u+1] where c = cumsum(a).
    Rows of the output sum (over t) to the amount of mass output u received
    (1.0 for complete fires).
    """
    c = jnp.cumsum(alphas, axis=-1)                       # [B, T]
    c_prev = c - alphas
    u = jnp.arange(u_max, dtype=alphas.dtype)             # [U]
    lo = jnp.maximum(c_prev[..., None], u[None, None, :])
    hi = jnp.minimum(c[..., None], u[None, None, :] + 1.0)
    return jnp.maximum(hi - lo, 0.0)


def cif_fire(
    hidden: jnp.ndarray,
    alphas: jnp.ndarray,
    u_max: int,
) -> jnp.ndarray:
    """Integrate-and-fire: [B, T, D] hidden + [B, T] alphas -> [B, U, D] fired.

    Pass *scaled* alphas in training (scale_alphas) and raw sigmoid alphas at
    inference (with fire_count for the tail-rounded output length).
    """
    w = cif_weights(alphas, u_max)                        # [B, T, U]
    # Full f32 accumulation: the weights come from cumsum cancellation, and
    # the default (bf16-class) matmul precision visibly corrupts boundaries.
    return jnp.einsum("btu,btd->bud", w, hidden,
                      precision=jax.lax.Precision.HIGHEST)


def fire_count(alphas: jnp.ndarray, valid_mask: jnp.ndarray,
               tail_threshold: float = 0.5) -> jnp.ndarray:
    """Inference-time number of fires: floor(sum a) plus one more if the
    residual accumulation >= tail_threshold (reference tail-rounding)."""
    total = jnp.sum(jnp.where(valid_mask, alphas, 0.0), axis=-1)
    full = jnp.floor(total)
    tail = total - full
    return (full + (tail >= tail_threshold)).astype(jnp.int32)


def cif_scan_reference(hidden, alphas):
    """Sequential lax.scan CIF, used only in tests as the fidelity oracle for
    cif_fire (mirrors the reference's Python loop, incl. weight splitting).

    hidden [T, D], alphas [T] (single utterance) -> fired [T, D] buffer plus
    number of complete fires; fired[i] is the i-th fired embedding.
    """
    t, d = hidden.shape

    def step(carry, x):
        accum, acc_vec, n_fired, fired = carry
        a, h = x

        def fire(_):
            a1 = 1.0 - accum
            emb = acc_vec + a1 * h
            rem = a - a1
            new_fired = fired.at[n_fired].set(emb)
            return rem, rem * h, n_fired + 1, new_fired

        def no_fire(_):
            return accum + a, acc_vec + a * h, n_fired, fired

        new = jax.lax.cond(accum + a >= 1.0, fire, no_fire, None)
        return new, None

    fired0 = jnp.zeros((t, d), hidden.dtype)
    (accum, acc_vec, n, fired), _ = jax.lax.scan(
        step, (jnp.float32(0.0), jnp.zeros((d,), hidden.dtype), 0, fired0),
        (alphas, hidden))
    return fired, n, accum, acc_vec
