"""Sequence losses: label-smoothed cross-entropy + token accuracy.

Reference: src/transformer/loss.py `cal_performance` / `cal_loss` — manual
label smoothing via a smoothed one-hot distribution and KL-style CE over
non-ignored positions, normalized by the number of real tokens. Same math
here, vectorized over the padded [B, U, V] logits with an IGNORE_ID mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_asr import IGNORE_ID


def label_smoothing_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smoothing: float = 0.1,
    ignore_id: int = IGNORE_ID,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Label-smoothed CE.

    logits: [B, U, V]; targets: [B, U] with ignore_id padding.
    Returns (scalar loss normalized by #real tokens, #real tokens).

    Smoothing distributes eps over the other V-1 classes (the reference's
    `one_hot * (1 - eps) + (1 - one_hot) * eps / (n_class - 1)` formula).
    """
    v = logits.shape[-1]
    valid = targets != ignore_id
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # CE against smoothed one-hot == (1-eps-eps/(V-1)) * logp[target]
    #                               + eps/(V-1) * sum_v logp[v]
    eps = smoothing
    logp_target = jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    if eps > 0.0:
        off = eps / (v - 1)
        nll = -((1.0 - eps - off) * logp_target + off * jnp.sum(logp, axis=-1))
    else:
        nll = -logp_target
    n_tokens = jnp.sum(valid)
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(n_tokens, 1)
    return loss, n_tokens


def masked_row_mean(per_row: jnp.ndarray, row_valid: jnp.ndarray
                    ) -> jnp.ndarray:
    """Mean of per-row losses over valid rows only. Batches are padded to
    their bucket's static batch_size with dummy rows (feat_lengths == 0);
    those rows must not contribute to any loss, so every batch-mean in the
    models goes through this."""
    n = jnp.maximum(jnp.sum(row_valid), 1)
    return jnp.sum(jnp.where(row_valid, per_row, 0.0)) / n


def token_accuracy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_id: int = IGNORE_ID,
) -> jnp.ndarray:
    """Fraction of non-ignored positions predicted correctly (reference:
    `cal_performance` returns n_correct)."""
    valid = targets != ignore_id
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum(jnp.where(valid, pred == targets, False))
    return correct / jnp.maximum(jnp.sum(valid), 1)
