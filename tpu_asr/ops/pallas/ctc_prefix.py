"""Pallas kernel for the CTC prefix-score recursion (joint decoding).

The XLA lax.scan version pays per-iteration while-loop overhead 250+ times
per decode step — measured ~5 ms/step, the dominant joint-decode cost. This
kernel runs the whole recursion VMEM-resident per 8-beam tile: carries
(r_nb, r_b, psi) as [8, K] registers, streams the precomputed per-frame
inputs, and writes the r histories the beam search gathers from.

All vocab-sized work (candidate gather via one-hot einsum, phi computation)
stays in XLA — the kernel sees only [8, T, K] blocks. Inference-only (no
VJP needed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
B_TILE = 8


def _round_up(x, m):
    return (x + m - 1) // m * m


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


def _kernel(xc_ref, phi_ref, xb_ref, rnb0_ref, rb0_ref, psi0_ref, len_ref,
            psi_ref, nb_hist_ref, b_hist_ref):
    """xc/phi: [B_TILE, T, K]; xb: [B_TILE, T, 1]; inits: [B_TILE, K];
    len: [B_TILE, 1]; outputs: psi [B_TILE, K], histories [B_TILE, T, K]."""
    t_total = xc_ref.shape[1]
    lens = len_ref[:]                                   # [B, 1]

    nb_hist_ref[:, 0, :] = rnb0_ref[:]
    b_hist_ref[:, 0, :] = rb0_ref[:]

    def body(t, carry):
        r_nb, r_b, psi = carry
        xc = xc_ref[:, t, :]
        phi_tm1 = phi_ref[:, t - 1, :]
        xb = xb_ref[:, t, :]                            # [B, 1]
        new_nb = _logaddexp(r_nb, phi_tm1) + xc
        new_b = _logaddexp(r_nb, r_b) + xb
        new_psi = _logaddexp(psi, phi_tm1 + xc)
        active = t < lens                               # [B, 1]
        r_nb = jnp.where(active, new_nb, r_nb)
        r_b = jnp.where(active, new_b, r_b)
        psi = jnp.where(active, new_psi, psi)
        nb_hist_ref[:, t, :] = r_nb
        b_hist_ref[:, t, :] = r_b
        return r_nb, r_b, psi

    r_nb, r_b, psi = jax.lax.fori_loop(
        1, t_total, body, (rnb0_ref[:], rb0_ref[:], psi0_ref[:]))
    psi_ref[:] = psi


def ctc_prefix_scan_pallas(x_cand, phi, x_blank, r_nb0, r_b0, psi0,
                           lengths, interpret: bool | None = None):
    """Run the prefix recursion for K candidates per beam.

    x_cand/phi: [N, T, K]; x_blank: [N, T]; inits: [N, K]; lengths [N].
    Returns (psi [N, K], nb_hist [N, T, K], b_hist [N, T, K]).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, t, k = x_cand.shape
    n_pad = _round_up(n, B_TILE)
    k_pad = _round_up(k, 128)

    def pad(x, fill):
        widths = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, widths, constant_values=fill)
        if x.shape[-1] == k:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, k_pad - k)],
                        constant_values=fill)
        return x

    xc = pad(x_cand, NEG_INF)
    ph = pad(phi, NEG_INF)
    xb = pad(x_blank, NEG_INF)[:, :, None]    # [N, T, 1]
    nb0 = pad(r_nb0, NEG_INF)
    b0 = pad(r_b0, NEG_INF)
    p0 = pad(psi0, NEG_INF)
    ln = pad(lengths.astype(jnp.int32)[:, None], 1)

    grid = (n_pad // B_TILE,)
    bspec3 = lambda: pl.BlockSpec((B_TILE, t, k_pad), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    bspec2k = lambda: pl.BlockSpec((B_TILE, k_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    psi, nb_hist, b_hist = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            bspec3(), bspec3(),
            pl.BlockSpec((B_TILE, t, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bspec2k(), bspec2k(), bspec2k(),
            pl.BlockSpec((B_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[bspec2k(), bspec3(), bspec3()],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, t, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, t, k_pad), jnp.float32),
        ],
        interpret=interpret,
    )(xc, ph, xb, nb0, b0, p0, ln)
    return psi[:n, :k], nb_hist[:n, :, :k], b_hist[:n, :, :k]
