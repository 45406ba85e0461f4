"""Pallas kernel for the CTC prefix-score recursion (joint decoding).

The XLA lax.scan version pays per-iteration while-loop overhead 250+ times
per decode step — measured ~5 ms/step, the dominant joint-decode cost. This
kernel runs the whole recursion VMEM-resident per 8-row tile: carries
(r_nb, r_b, psi) as [8, 128] registers, streams the precomputed per-frame
inputs, and writes the r histories the beam search gathers from.

Lane packing (round 3): the TPU lane dimension is 128 wide, but K (scored
candidates per beam) is only 2W+1 — 11 at beam 5, 21 at beam 10. Padding
each beam's K to 128 wasted >80% of every streamed byte and every history
write, and the grid (and thus the serial per-tile fori_loop count) grew
with N = B*W. Instead, p = 128 // K whole beams are PACKED into one
128-lane row (lane l belongs to beam l // K, candidate l % K), shrinking
the grid and all HBM traffic by ~p. The recursion is purely elementwise
over lanes, so packing needs only per-lane xb (blank log-prob) and
per-lane length masks instead of the old per-row broadcasts.

All vocab-sized work (candidate gather via one-hot einsum, phi computation)
stays in XLA — the kernel sees only [8, T, 128] blocks. Inference-only (no
VJP needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
B_TILE = 8            # minimum row tile (f32 sublane quantum)
LANES = 128
VMEM_BUDGET = 12 * 1024 * 1024   # bytes of f32 streams per tile


def _pick_b_tile(t: int, n_streams: int) -> int:
    """Widest row tile whose f32 streams fit the VMEM budget: fewer grid
    tiles = fewer serial 250-iteration fori_loops (the kernel's critical
    path is loop count, not lane math)."""
    tile = B_TILE
    while (tile * 2 * n_streams * t * LANES * 4 <= VMEM_BUDGET
           and tile < 64):
        tile *= 2
    return tile


def _round_up(x, m):
    return (x + m - 1) // m * m


def _logaddexp(a, b):
    # m + log1p(exp(-|a-b|)): one transcendental pair instead of two exps
    # + a log — the 250-iteration recursion runs 3 of these per step, so
    # the VPU transcendental count is the loop's critical path.
    m = jnp.maximum(a, b)
    d = -jnp.abs(a - b)
    out = m + jnp.log1p(jnp.exp(jnp.maximum(d, NEG_INF)))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


# time steps per fori_loop iteration: the recursion is ~30 vector ops on
# [tile, 128] f32 per step, so per-iteration loop control dominates
# (~5.4 us/iter at U=1 on v5e). Mosaic's fori_loop only supports
# unroll=1/full, so the unroll is manual: T is host-padded so that
# (T-1) % UNROLL == 0 and each iteration advances UNROLL steps.
UNROLL = 4


def _kernel(xc_ref, phi_ref, xb_ref, rnb0_ref, rb0_ref, psi0_ref, len_ref,
            psi_ref, nb_hist_ref, b_hist_ref, *, write_hist: bool):
    """xc/phi/xb: [tile, T, L]; inits + len: [tile, L] (per-lane);
    outputs: psi [tile, L], histories [tile, T, L]."""
    t_total = xc_ref.shape[1]
    lens = len_ref[:]                                   # [B, L]

    if write_hist:
        nb_hist_ref[:, 0, :] = rnb0_ref[:]
        b_hist_ref[:, 0, :] = rb0_ref[:]

    def one(t, carry):
        r_nb, r_b, psi = carry
        xc = xc_ref[:, t, :]
        phi_tm1 = phi_ref[:, t - 1, :]
        xb = xb_ref[:, t, :]                            # [B, L]
        new_nb = _logaddexp(r_nb, phi_tm1) + xc
        new_b = _logaddexp(r_nb, r_b) + xb
        new_psi = _logaddexp(psi, phi_tm1 + xc)
        active = t < lens                               # [B, L]
        r_nb = jnp.where(active, new_nb, r_nb)
        r_b = jnp.where(active, new_b, r_b)
        psi = jnp.where(active, new_psi, psi)
        if write_hist:
            nb_hist_ref[:, t, :] = r_nb
            b_hist_ref[:, t, :] = r_b
        return r_nb, r_b, psi

    def body(i, carry):
        for j in range(UNROLL):
            carry = one(1 + i * UNROLL + j, carry)
        return carry

    assert (t_total - 1) % UNROLL == 0, t_total
    r_nb, r_b, psi = jax.lax.fori_loop(
        0, (t_total - 1) // UNROLL, body,
        (rnb0_ref[:], rb0_ref[:], psi0_ref[:]))
    psi_ref[:] = psi
    if not write_hist:
        # dummy 1-frame outputs (kept so both variants share one signature)
        nb_hist_ref[:, 0, :] = r_nb
        b_hist_ref[:, 0, :] = r_b


def ctc_prefix_scan_pallas(x_cand, phi, x_blank, r_nb0, r_b0, psi0,
                           lengths, interpret: bool | None = None,
                           return_hist: bool = True):
    """Run the prefix recursion for K candidates per beam.

    x_cand/phi: [N, T, K]; x_blank: [N, T]; inits: [N, K]; lengths [N].
    Returns (psi [N, K], nb_hist [N, T, K], b_hist [N, T, K]); histories
    are None when return_hist=False (the cheap score-only pass — skips
    the two [N, T, K] HBM write streams entirely).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, t, k = x_cand.shape
    # pad time so the kernel's manual UNROLL divides the step count;
    # padded frames sit past every length and leave the carries unchanged
    t_pad = t if t <= 1 else 1 + _round_up(t - 1, UNROLL)
    if t_pad != t:
        tp = [(0, 0), (0, t_pad - t)]
        x_cand = jnp.pad(x_cand, tp + [(0, 0)], constant_values=NEG_INF)
        phi = jnp.pad(phi, tp + [(0, 0)], constant_values=NEG_INF)
        x_blank = jnp.pad(x_blank, tp, constant_values=NEG_INF)
    p = max(1, LANES // k)                 # beams packed per 128-lane row
    b_tile = _pick_b_tile(t_pad, 3 + (2 if return_hist else 0))
    n_rows = _round_up(-(-n // p), b_tile)  # row tiles of packed beams
    n_pack = n_rows * p
    lanes = _round_up(p * k, LANES)

    def pack(x, fill, per_lane=False):
        """[N, ...] (last dim K, or none when per_lane) -> packed rows
        [n_rows, ..., lanes] with beam l//K on lane block l//K*K."""
        x = jnp.pad(x, [(0, n_pack - n)] + [(0, 0)] * (x.ndim - 1),
                    constant_values=fill)
        if per_lane:                       # [N_pack, ...] -> repeat over K
            x = jnp.repeat(x[..., None], k, axis=-1)
        # [n_rows, p, ..., k] -> [n_rows, ..., p, k] -> [n_rows, ..., p*k]
        x = x.reshape(n_rows, p, *x.shape[1:])
        x = jnp.moveaxis(x, 1, -2)
        x = x.reshape(*x.shape[:-2], p * k)
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, lanes - p * k)],
                       constant_values=fill)

    xc = pack(x_cand, NEG_INF)                          # [R, T, L]
    ph = pack(phi, NEG_INF)
    xb = pack(x_blank, NEG_INF, per_lane=True)          # [R, T, L]
    nb0 = pack(r_nb0, NEG_INF)                          # [R, L]
    b0 = pack(r_b0, NEG_INF)
    p0 = pack(psi0, NEG_INF)
    ln = pack(lengths.astype(jnp.int32), 1, per_lane=True)  # [R, L]

    grid = (n_rows // b_tile,)
    t_hist = t_pad if return_hist else 1
    bspec3 = lambda tt: pl.BlockSpec((b_tile, tt, lanes),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM)
    bspec2 = lambda: pl.BlockSpec((b_tile, lanes), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    import functools
    psi, nb_hist, b_hist = pl.pallas_call(
        functools.partial(_kernel, write_hist=return_hist),
        grid=grid,
        in_specs=[bspec3(t_pad), bspec3(t_pad), bspec3(t_pad),
                  bspec2(), bspec2(), bspec2(), bspec2()],
        out_specs=[bspec2(), bspec3(t_hist), bspec3(t_hist)],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, t_hist, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, t_hist, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(xc, ph, xb, nb0, b0, p0, ln)

    def unpack(x):
        """[n_rows, ..., lanes] -> [N, ..., K] (time sliced back to t)."""
        x = x[..., : p * k]
        if x.ndim == 3:
            x = x[:, :t]
        x = x.reshape(*x.shape[:-1], p, k)
        x = jnp.moveaxis(x, -2, 1)
        x = x.reshape(n_pack, *x.shape[2:])
        return x[:n]

    if not return_hist:
        return unpack(psi), None, None
    return unpack(psi), unpack(nb_hist), unpack(b_hist)
