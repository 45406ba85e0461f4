"""Pallas CTC forward-backward (BASELINE.json: "CTC forward-backward loss
... as Pallas kernels").

Replaces autodiff-through-lax.scan with an explicit forward (alpha) +
backward (beta) pair, custom-VJP'd. TPU-native decomposition:

  - All vocab-sized work stays OUTSIDE the kernels: the caller gathers
    emissions E[b,t,s] = logp[b,t,z_s] (S = 2U+1 lattice, ~30x smaller
    than V for char models) and scatters grad_E back to grad_logp with a
    segment-sum. Gathers/scatters/log_softmax are XLA's strength.
  - The kernels do only the sequential part, entirely VMEM-resident: one
    fori_loop over T updating [B_TILE, S] rows with shifted log-space adds
    (VPU), writing alpha history for the backward pass.

Grid: one program per B_TILE utterances; E/alpha blocks stream HBM<->VMEM
via BlockSpec pipelining. Shapes padded: S to 128 lanes, B to 8 sublanes.

Reference behavior matched: torch.nn.CTCLoss semantics (blank=0,
zero_infinity) — see tests/unit/test_ctc_pallas.py for value+grad parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
B_TILE = 8          # minimum tile (sublane multiple)
VMEM_BUDGET = 8 * 1024 * 1024   # bytes for the 2-3 [B_TILE, T, S] streams


def _pick_b_tile(b, t, s_pad):
    """Widest batch tile whose [tile, T, S] f32 streams (emissions + alpha
    history + grad, double-buffered by the pipeline) fit the VMEM budget.
    Wider tiles mean fewer serial grid programs: the lattice recursion is
    latency-bound, so halving the grid nearly halves the kernel time."""
    tile = B_TILE
    while tile < 32 and tile < b * 2:
        nxt = tile * 2
        if 3 * nxt * t * s_pad * 4 > VMEM_BUDGET:
            break
        tile = nxt
    return tile


def _round_up(x, m):
    return (x + m - 1) // m * m


def _shift_right(x, fill):
    """[B, S] -> shifted by +1 along S (x[:, s-1] at position s)."""
    rolled = pltpu.roll(x, 1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col == 0, fill, rolled)


def _shift_right2(x, fill):
    rolled = pltpu.roll(x, 2, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < 2, fill, rolled)


def _shift_left(x, fill):
    rolled = pltpu.roll(x, x.shape[1] - 1, axis=1)  # roll is circular, >= 0
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col == x.shape[1] - 1, fill, rolled)


def _shift_left2(x, fill):
    rolled = pltpu.roll(x, x.shape[1] - 2, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= x.shape[1] - 2, fill, rolled)


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe)
                           + jnp.exp(c - m_safe))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


def _fwd_kernel(emit_ref, skip_ref, valid_ref, ilen_ref, llen_ref,
                nll_ref, alpha_ref):
    """One B_TILE x [T, S] forward pass.

    emit_ref:  [B_TILE, T, S]  emission log-probs (padded with NEG_INF)
    skip_ref:  [B_TILE, S]     1.0 where the s-2 -> s skip is allowed
    valid_ref: [B_TILE, S]     1.0 where lattice position is valid
    ilen/llen: [B_TILE, 1]     int32 lengths (SMEM-ish, small VMEM rows)
    nll_ref:   [B_TILE, 1]     output
    alpha_ref: [B_TILE, T, S]  output alpha history (for backward)
    """
    t_total = emit_ref.shape[1]
    s = emit_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (emit_ref.shape[0], s), 1)
    skip = skip_ref[:] > 0.5
    valid = valid_ref[:] > 0.5
    llen = llen_ref[:]                                   # [B_TILE, 1]
    ilen = ilen_ref[:]

    emit0 = emit_ref[:, 0, :]
    alpha = jnp.where(col == 0, emit0, NEG_INF)
    alpha = jnp.where((col == 1) & (llen > 0), emit0, alpha)
    alpha = jnp.where(valid, alpha, NEG_INF)
    alpha_ref[:, 0, :] = alpha

    def body(t, alpha):
        emit = emit_ref[:, t, :]
        a1 = _shift_right(alpha, NEG_INF)
        a2 = jnp.where(skip, _shift_right2(alpha, NEG_INF), NEG_INF)
        new = _logaddexp3(alpha, a1, a2) + emit
        new = jnp.where(valid, new, NEG_INF)
        active = t < ilen                                 # [B_TILE, 1]
        new = jnp.where(active, new, alpha)
        alpha_ref[:, t, :] = new
        return new

    alpha = jax.lax.fori_loop(1, t_total, body, alpha)

    end = 2 * llen                                        # [B_TILE, 1]
    is_end = (col == end) | ((col == end - 1) & (llen > 0))
    masked = jnp.where(is_end, alpha, NEG_INF)
    m = jnp.max(masked, axis=1, keepdims=True)
    m_safe = jnp.maximum(m, NEG_INF)
    ll = m_safe + jnp.log(jnp.sum(jnp.exp(masked - m_safe), axis=1,
                                  keepdims=True))
    nll_ref[:] = -jnp.where(m <= NEG_INF / 2, NEG_INF, ll)


def _bwd_kernel(emit_ref, skip_ref, valid_ref, ilen_ref, llen_ref,
                alpha_ref, nll_ref, grad_emit_ref):
    """Beta recursion + grad_E[t,s] = -exp(alpha + beta - ll)."""
    t_total = emit_ref.shape[1]
    s = emit_ref.shape[2]
    b = emit_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    skip_l2 = _shift_left2(jnp.where(skip_ref[:] > 0.5, 1.0, 0.0), 0.0) > 0.5
    valid = valid_ref[:] > 0.5
    llen = llen_ref[:]
    ilen = ilen_ref[:]
    ll = -nll_ref[:]                                      # [B, 1]

    end = 2 * llen
    end_init = jnp.where(
        (col == end) | ((col == end - 1) & (llen > 0)), 0.0, NEG_INF)

    def body(i, beta):
        t = t_total - 1 - i
        # candidate from t+1 (only meaningful when t < ilen - 1)
        def from_next():
            tmp = beta + emit_ref[:, jnp.minimum(t + 1, t_total - 1), :]
            b1 = _shift_left(tmp, NEG_INF)
            b2 = jnp.where(skip_l2, _shift_left2(tmp, NEG_INF), NEG_INF)
            return _logaddexp3(tmp, b1, b2)

        cand = from_next()
        beta_t = jnp.where(t == ilen - 1, end_init,
                           jnp.where(t < ilen - 1, cand, NEG_INF))
        beta_t = jnp.where(valid, beta_t, NEG_INF)
        alpha_t = alpha_ref[:, t, :]
        g = alpha_t + beta_t - ll
        grad = jnp.where((alpha_t > NEG_INF / 2) & (beta_t > NEG_INF / 2),
                         -jnp.exp(g), 0.0)
        grad_emit_ref[:, t, :] = grad
        return beta_t

    jax.lax.fori_loop(0, t_total, body,
                      jnp.full((b, s), NEG_INF))


def _pallas_ctc_fwd(emissions, skip_f, valid_f, ilens, llens, interpret,
                    b_tile):
    b, t, s = emissions.shape
    B_TILE = b_tile
    grid = (b // B_TILE,)
    kernel = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_TILE, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, t, s), jnp.float32),
        ],
        interpret=interpret,
    )
    return kernel(emissions, skip_f, valid_f, ilens, llens)


def _pallas_ctc_bwd(emissions, skip_f, valid_f, ilens, llens, alphas, nll,
                    interpret, b_tile):
    b, t, s = emissions.shape
    B_TILE = b_tile
    grid = (b // B_TILE,)
    kernel = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_TILE, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B_TILE, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, t, s), jnp.float32)],
        interpret=interpret,
    )
    return kernel(emissions, skip_f, valid_f, ilens, llens, alphas, nll)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ctc_nll_from_emissions(emissions, skip_f, valid_f, ilens, llens,
                           interpret=False, b_tile=B_TILE):
    nll, _ = _pallas_ctc_fwd(emissions, skip_f, valid_f, ilens, llens,
                             interpret, b_tile)
    return nll[:, 0]


def _vjp_fwd(emissions, skip_f, valid_f, ilens, llens, interpret, b_tile):
    nll, alphas = _pallas_ctc_fwd(emissions, skip_f, valid_f, ilens, llens,
                                  interpret, b_tile)
    return nll[:, 0], (emissions, skip_f, valid_f, ilens, llens, alphas, nll)


def _vjp_bwd(interpret, b_tile, res, g):
    emissions, skip_f, valid_f, ilens, llens, alphas, nll = res
    grad_e = _pallas_ctc_bwd(emissions, skip_f, valid_f, ilens, llens,
                             alphas, nll, interpret, b_tile)
    grad_e = grad_e * g[:, None, None]
    zeros = jnp.zeros_like
    return (grad_e, zeros(skip_f), zeros(valid_f), None, None)


ctc_nll_from_emissions.defvjp(_vjp_fwd, _vjp_bwd)


def ctc_loss_pallas(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "mean_label",
    log_input: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in replacement for tpu_asr.ops.ctc.ctc_loss on TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, v = logits.shape
    u = labels.shape[1]
    s = 2 * u + 1
    s_pad = _round_up(s, 128)
    b_tile = _pick_b_tile(b, t, s_pad)
    b_pad = _round_up(b, b_tile)

    from tpu_asr.ops.ctc import lattice_emissions
    z = jnp.full((b, s), blank, labels.dtype).at[:, 1::2].set(labels)
    emissions = lattice_emissions(logits, z, log_input)  # [B, T, S]

    z_shift2 = jnp.concatenate(
        [jnp.full((b, 2), blank, z.dtype), z[:, :-2]], axis=1)
    allow_skip = (z != blank) & (z != z_shift2)
    allow_skip = allow_skip.at[:, :2].set(False)
    s_pos = jnp.arange(s)[None, :]
    valid_s = s_pos <= 2 * label_lengths[:, None]

    # pad S to lanes, B to sublanes
    def pad(x, fill):
        x = jnp.pad(x, [(0, b_pad - b)] + [(0, 0)] * (x.ndim - 1),
                    constant_values=fill)
        if x.shape[-1] == s:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, s_pad - s)],
                        constant_values=fill)
        return x

    emissions_p = pad(emissions, NEG_INF)
    skip_f = pad(allow_skip.astype(jnp.float32), 0.0)
    valid_f = pad(valid_s.astype(jnp.float32) + jnp.zeros((b, s)), 0.0)
    ilens_p = pad(logit_lengths.astype(jnp.int32)[:, None], 1)
    llens_p = pad(label_lengths.astype(jnp.int32)[:, None], 0)

    nll = ctc_nll_from_emissions(emissions_p, skip_f, valid_f, ilens_p,
                                 llens_p, interpret, b_tile)[:b]

    feasible = logit_lengths >= label_lengths
    nll = jnp.where(feasible & (nll < -NEG_INF / 2), nll, 0.0)

    # NOTE: grad_E flows back through gather_emissions' einsum — its
    # autodiff transpose IS the scatter-add to grad_logp, on the MXU.
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "mean_label":
        return jnp.mean(nll / jnp.maximum(label_lengths, 1))
    raise ValueError(f"unknown reduction {reduction!r}")
