"""Exact top-k tuned for TPU.

`lax.top_k` on TPU lowers to a full-width variadic sort — O(V log^2 V)
serial bitonic passes. For the beam search's candidate selection
([B*W, V~4k] every decode step) that sort is the single hottest op in the
decode profile (~1.6 ms/step at beam 10). A two-stage group reduction —
per-group top-k over 128-lane groups, then top-k over the G*k survivors —
is bit-exact (values AND tie-breaking) and measured 2.3x faster on v5e
(970 vs 2273 us on [320, 4233], k=21).

Exactness: the global top-k is contained in the union of per-group
top-k's. Tie-breaking matches `lax.top_k` (smallest index wins): stage-1
candidates are laid out group-major, so equal values resolve to the
earlier group = globally smaller index; within a group stage-1 already
broke the tie by index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GROUP = 128  # lane width; measured faster than 256/512 groups


def exact_top_k(x: jnp.ndarray, k: int, group: int = _GROUP):
    """Drop-in `lax.top_k` over the last axis (any leading shape).

    Falls back to `lax.top_k` when the two-stage split cannot win
    (last dim too small, or k >= group).
    """
    v = x.shape[-1]
    n_groups = -(-v // group)
    if k >= group or n_groups < 4 or n_groups * k >= v:
        return jax.lax.top_k(x, k)
    lead = x.shape[:-1]
    xf = x.reshape(-1, v)
    n = xf.shape[0]
    pad = n_groups * group - v
    if pad:
        # -inf (not finfo.min) so pads never beat real -inf entries; pads
        # sit at the highest indices, so index-ascending tie-break keeps
        # preferring real elements.
        fill = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                else jnp.iinfo(x.dtype).min)
        xf = jnp.pad(xf, ((0, 0), (0, pad)), constant_values=fill)
    v1, i1 = jax.lax.top_k(xf.reshape(n * n_groups, group), k)
    base = (jnp.arange(n_groups, dtype=jnp.int32) * group).repeat(k)[None, :]
    v1 = v1.reshape(n, n_groups * k)
    i1 = i1.reshape(n, n_groups * k).astype(jnp.int32) + base
    v2, i2 = jax.lax.top_k(v1, k)
    idx = jnp.take_along_axis(i1, i2, axis=1)
    return v2.reshape(*lead, k), idx.reshape(*lead, k)
