"""Pallas CIF fire kernel (BASELINE.json: "CIF weighted-accumulation-and-
fire scan ... as Pallas kernels").

Fuses the overlap-weight computation with the fire matmul: for each
(batch, U-tile) the kernel streams T-tiles of (cumsum boundaries, encoder
states) through VMEM, computes the [T_BLK, U_BLK] overlap block on the VPU
and accumulates fired = w^T @ h on the MXU — the [B, T, U] weight tensor
never exists in HBM. Backward recomputes through the (cheap) XLA reference
formulation under custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_BLK = 128
U_BLK = 128


def _cdiv(a, b):
    return (a + b - 1) // b


def _cif_kernel(c_ref, h_ref, out_ref, acc_scr, *, u_blk, t_blk, n_t):
    it = pl.program_id(2)
    iu = pl.program_id(1)

    @pl.when(it == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    c = c_ref[0]                                   # [2, T_BLK]: (c_prev, c)
    c_prev, c_cur = c[0], c[1]
    u0 = iu * u_blk
    u_ids = jax.lax.broadcasted_iota(jnp.float32, (t_blk, u_blk), 1) + u0
    lo = jnp.maximum(c_prev[:, None], u_ids)
    hi = jnp.minimum(c_cur[:, None], u_ids + 1.0)
    w = jnp.maximum(hi - lo, 0.0)                  # [T_BLK, U_BLK]
    h = h_ref[0]                                   # [T_BLK, D]
    acc_scr[:] += jax.lax.dot_general(
        w, h, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [U_BLK, D]

    @pl.when(it == n_t - 1)
    def _():
        out_ref[0] = acc_scr[:].astype(out_ref.dtype)


def _cif_fire_pallas_fwd(c2, hidden, u_max, interpret):
    """c2 [B, 2, T] rows (c_prev, c); hidden [B, T, D] -> [B, u_pad, D]."""
    b, _, t = c2.shape
    d = hidden.shape[-1]
    t_blk = min(T_BLK, t)
    u_pad = _cdiv(u_max, U_BLK) * U_BLK if u_max > U_BLK else u_max
    u_blk = min(U_BLK, u_pad)
    n_t = _cdiv(t, t_blk)
    n_u = _cdiv(u_pad, u_blk)
    # pad T: c rows padded with a large constant so overlap is empty
    t_full = n_t * t_blk
    if t_full != t:
        pad = t_full - t
        c2 = jnp.pad(c2, ((0, 0), (0, 0), (0, pad)),
                     constant_values=1e9)
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
    kernel = pl.pallas_call(
        functools.partial(_cif_kernel, u_blk=u_blk, t_blk=t_blk, n_t=n_t),
        grid=(b, n_u, n_t),
        in_specs=[
            pl.BlockSpec((1, 2, t_blk), lambda b_, iu, it: (b_, 0, it),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_blk, d), lambda b_, iu, it: (b_, it, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, u_blk, d), lambda b_, iu, it: (b_, iu, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_u * u_blk, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((u_blk, d), jnp.float32)],
        interpret=interpret,
    )
    return kernel(c2, hidden)[:, :u_max]


def _reference_fire(hidden, alphas, u_max):
    from tpu_asr.ops.cif import cif_fire
    return cif_fire(hidden, alphas, u_max)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def cif_fire_pallas(hidden, alphas, u_max, interpret=False):
    """Drop-in for tpu_asr.ops.cif.cif_fire on TPU.

    hidden [B, T, D] (any float dtype; accumulated f32), alphas [B, T].
    """
    c = jnp.cumsum(alphas.astype(jnp.float32), axis=-1)
    c2 = jnp.stack([c - alphas, c], axis=1)        # [B, 2, T]
    return _cif_fire_pallas_fwd(c2, hidden.astype(jnp.float32), u_max,
                                interpret)


def _fwd(hidden, alphas, u_max, interpret):
    return cif_fire_pallas(hidden, alphas, u_max, interpret), (hidden, alphas)


def _bwd(u_max, interpret, res, g):
    hidden, alphas = res
    _, vjp = jax.vjp(lambda h, a: _reference_fire(h, a, u_max),
                     hidden, alphas)
    return vjp(g)


cif_fire_pallas.defvjp(_fwd, _bwd)
