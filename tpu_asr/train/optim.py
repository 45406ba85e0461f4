"""Optimizer: Adam under the Noam (inverse-sqrt warmup) schedule.

Reference: src/transformer/optimizer.py `TransformerOptimizer` — Adam
(beta=(0.9, 0.98), eps=1e-9) with lr = k * d_model^-0.5 *
min(step^-0.5, step * warmup^-1.5), warmup ~ 4000. Expressed as an optax
chain; gradient clipping is part of the chain (reference clips by norm in
the solver [med]).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(d_model: int, warmup_steps: int = 4000, k: float = 1.0):
    scale = k * d_model ** -0.5

    def sched(step):
        s = jnp.maximum(step, 0) + 1.0  # 1-indexed, as the reference counts
        return scale * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)

    return sched


def make_optimizer(
    d_model: int,
    warmup_steps: int = 4000,
    k: float = 1.0,
    grad_clip: float = 5.0,
    weight_decay: float = 0.0,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """accum_steps > 1 enables gradient accumulation (optax.MultiSteps):
    micro-batch gradients are averaged and the Adam/Noam update applies
    every accum_steps-th step — with mean losses this equals training on
    an accum_steps-times-larger batch (tested), at flat memory."""
    sched = noam_schedule(d_model, warmup_steps, k)
    parts = []
    if grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay > 0:
        parts.append(optax.adamw(sched, b1=0.9, b2=0.98, eps=1e-9,
                                 weight_decay=weight_decay))
    else:
        parts.append(optax.adam(sched, b1=0.9, b2=0.98, eps=1e-9))
    tx = optax.chain(*parts)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
