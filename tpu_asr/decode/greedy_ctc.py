"""Greedy CTC decode: one encoder pass + argmax + vectorized collapse.

Reference behavior: the CTC model's recognize path (argmax over frames,
collapse repeats, drop blanks). Unlike the reference (host loop per
utterance), this is a single jit-compiled batched function.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_asr.ops.ctc import ctc_greedy_collapse


def ctc_greedy_decode(ctc_logits: jnp.ndarray, enc_lengths: jnp.ndarray,
                      blank: int = 0, pad_id: int = -1,
                      return_times: bool = False):
    """ctc_logits [B, T, V] -> (tokens [B, T] pad_id-padded, lengths [B]
    [, emission frame indices [B, T] -1-padded with return_times])."""
    ids = jnp.argmax(ctc_logits, axis=-1)
    return ctc_greedy_collapse(ids, enc_lengths, blank=blank, pad_id=pad_id,
                               return_times=return_times)
