"""On-device SpecAugment: frequency + time masking and optional time warp.

TPU-native replacement for the reference's host-side numpy SpecAugment
(reference: src/data/ SpecAugment applied in the collate path; eastonYi
addition on top of kaituoxu/Speech-Transformer; masking only — the
time-warp option here is beyond-reference, default off). Runs inside the
jitted train step on the padded feature batch, so augmentation costs
~nothing: a handful of vectorized comparisons fused into the encoder's
first matmul, plus (when enabled) two time-axis gathers for the warp.

Static shapes throughout: mask starts/widths are uniform random scalars per
(batch, mask), realized as boolean range masks — no dynamic slicing; the
warp is a per-utterance piecewise-linear index map gathered with lerp.
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
    # W in the paper: warp a random interior point by up to +-W frames
    # (0 = off, the reference's behavior — it implements masking only).
    time_warp_window: int = 0


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


def _time_warp(key: jax.Array, feats: jnp.ndarray,
               feat_lengths: jnp.ndarray, window: int) -> jnp.ndarray:
    """SpecAugment time warp on a padded batch [B, T, D].

    A random interior frame w0 ~ U[W, L-W) moves to w0+d, d ~ U[-W, W];
    the time axis is piecewise-linearly re-indexed around it and sampled
    with linear interpolation (two static gathers + lerp — the sparse
    image warp of the paper reduces to 1-D linear interp when, as in
    every production implementation, the warp is along time only).
    Frames past the valid length are untouched; utterances shorter than
    2W+2 are returned unwarped.
    """
    b, t, _ = feats.shape
    lens = feat_lengths.astype(jnp.float32)                  # [B]
    k_c, k_d = jax.random.split(key)
    can_warp = feat_lengths > 2 * window + 1
    u = jax.random.uniform(k_c, (b,))
    w0 = jnp.floor(window + u * jnp.maximum(lens - 2 * window, 1.0))
    dist = jax.random.randint(k_d, (b,), -window, window + 1
                              ).astype(jnp.float32)
    w0_new = jnp.clip(w0 + dist, 1.0, jnp.maximum(lens - 2.0, 1.0))
    last = jnp.maximum(lens - 1.0, 2.0)                      # map endpoint
    pos = jnp.arange(t, dtype=jnp.float32)[None, :]          # [1, T]
    left = pos * (w0 / w0_new)[:, None]
    right = (w0[:, None]
             + (pos - w0_new[:, None])
             * ((last - w0) / jnp.maximum(last - w0_new, 1e-6))[:, None])
    src = jnp.where(pos <= w0_new[:, None], left, right)
    ident = (~can_warp)[:, None] | (pos >= lens[:, None])
    src = jnp.where(ident, pos, jnp.clip(src, 0.0, last[:, None]))
    lo = jnp.floor(src)
    frac = (src - lo)[:, :, None]
    lo = lo.astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    f_lo = jnp.take_along_axis(feats, lo[:, :, None], axis=1)
    f_hi = jnp.take_along_axis(feats, hi[:, :, None], axis=1)
    return (f_lo * (1.0 - frac) + f_hi * frac).astype(feats.dtype)


def spec_augment(
    key: jax.Array,
    feats: jnp.ndarray,
    feat_lengths: jnp.ndarray,
    cfg: SpecAugmentConfig = SpecAugmentConfig(),
) -> jnp.ndarray:
    """Apply SpecAugment to a padded batch [B, T, D] with valid lengths [B]."""
    b, t, d = feats.shape
    k_f, k_t, k_w0 = jax.random.split(key, 3)
    if cfg.time_warp_window > 0:
        feats = _time_warp(k_w0, feats, feat_lengths, cfg.time_warp_window)
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
