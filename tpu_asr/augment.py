"""On-device SpecAugment: frequency + time masking (and optional time warp skip).

TPU-native replacement for the reference's host-side numpy SpecAugment
(reference: src/data/ SpecAugment applied in the collate path; eastonYi
addition on top of kaituoxu/Speech-Transformer). Runs inside the jitted train
step on the padded feature batch, so augmentation costs ~nothing: a handful of
vectorized comparisons fused into the encoder's first matmul.

Static shapes throughout: mask starts/widths are uniform random scalars per
(batch, mask), realized as boolean range masks — no dynamic slicing.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    num_freq_masks: int = 2
    freq_mask_width: int = 27       # F in the SpecAugment paper
    num_time_masks: int = 2
    time_mask_width: int = 40       # T in the paper (frames)
    time_mask_max_ratio: float = 1.0  # cap widths at ratio * utt length
    mask_value: float = 0.0


def _range_mask(key, batch: int, size: int, num_masks: int, max_width: int,
                upper: jnp.ndarray) -> jnp.ndarray:
    """[batch, size] boolean: True where masked.

    upper: [batch] per-utterance cap on start positions (valid length).
    """
    k_w, k_s = jax.random.split(key)
    widths = jax.random.randint(k_w, (batch, num_masks), 0, max_width + 1)
    max_start = jnp.maximum(upper[:, None] - widths, 1)
    starts = (jax.random.uniform(k_s, (batch, num_masks)) * max_start).astype(jnp.int32)
    pos = jnp.arange(size)[None, None, :]
    m = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
    return jnp.any(m, axis=1)


def spec_augment(
    key: jax.Array,
    feats: jnp.ndarray,
    feat_lengths: jnp.ndarray,
    cfg: SpecAugmentConfig = SpecAugmentConfig(),
) -> jnp.ndarray:
    """Apply SpecAugment to a padded batch [B, T, D] with valid lengths [B]."""
    b, t, d = feats.shape
    k_f, k_t = jax.random.split(key)
    freq_mask = _range_mask(
        k_f, b, d, cfg.num_freq_masks, cfg.freq_mask_width,
        jnp.full((b,), d, dtype=jnp.int32))
    t_cap = jnp.minimum(
        jnp.full((b,), cfg.time_mask_width, dtype=jnp.int32),
        (feat_lengths.astype(jnp.float32) * cfg.time_mask_max_ratio).astype(jnp.int32))
    # Per-utterance time-mask width cap: draw with the global max then clamp.
    k_w, k_s = jax.random.split(k_t)
    widths = jax.random.randint(k_w, (b, cfg.num_time_masks), 0,
                                cfg.time_mask_width + 1)
    widths = jnp.minimum(widths, t_cap[:, None])
    max_start = jnp.maximum(feat_lengths[:, None] - widths, 1)
    starts = (jax.random.uniform(k_s, (b, cfg.num_time_masks)) * max_start).astype(jnp.int32)
    pos = jnp.arange(t)[None, None, :]
    time_mask = jnp.any(
        (pos >= starts[..., None]) & (pos < (starts + widths)[..., None]), axis=1)
    masked = jnp.where(freq_mask[:, None, :], cfg.mask_value, feats)
    masked = jnp.where(time_mask[:, :, None], cfg.mask_value, masked)
    return masked
