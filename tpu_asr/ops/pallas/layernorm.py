"""Fused residual-add + LayerNorm as Pallas kernels (forward + backward).

Reference counterpart: the post-norm residual wiring of
src/transformer/encoder.py / decoder.py (`LayerNorm(residual + sublayer)`).

Why a kernel: XLA lowers post-norm LN into a convert_reduce (stats) plus a
separate normalize fusion, reading the [N, D] activation two-to-three
times per call; with ~30 LayerNorms per hybrid train step that tail is
~1.5 ms on v5e (per-op trace r2). The kernel does residual-add, stats,
normalize in ONE VMEM pass (read both inputs once, write once), and the
backward recomputes x-hat in-VMEM, emitting dx plus per-program partial
dgamma/dbeta that XLA sums (a [n_programs, D] reduction, trivial).

Numerics: inputs in any float dtype (bf16 in training); all statistics and
the backward run in f32 (flax LayerNorm convention: float32 reductions),
output cast back to the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 512


def _cdiv(a, b):
    return (a + b - 1) // b


def _fwd_kernel(r_ref, h_ref, g_ref, b_ref, o_ref, mean_ref, rstd_ref,
                *, eps):
    x = r_ref[:].astype(jnp.float32) + h_ref[:].astype(jnp.float32)
    d = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)            # [TR, 1]
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    g = g_ref[:].astype(jnp.float32)                      # [1, D]
    b = b_ref[:].astype(jnp.float32)
    o_ref[:] = (xhat * g + b).astype(o_ref.dtype)
    mean_ref[:] = mean
    rstd_ref[:] = rstd


def _bwd_kernel(r_ref, h_ref, dy_ref, g_ref, mean_ref, rstd_ref,
                dx_ref, dg_ref, db_ref):
    x = r_ref[:].astype(jnp.float32) + h_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    mean = mean_ref[:]
    rstd = rstd_ref[:]
    xhat = (x - mean) * rstd
    a = dy * g
    m1 = jnp.mean(a, axis=-1, keepdims=True)
    m2 = jnp.mean(a * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (rstd * (a - m1 - xhat * m2)).astype(dx_ref.dtype)
    # per-program partials in 8-row blocks (Mosaic sublane alignment):
    # the partial sum lands in row 0, rows 1-7 are zeros, XLA sums all.
    d = x.shape[-1]
    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0) == 0
    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)         # [1, D]
    db = jnp.sum(dy, axis=0, keepdims=True)
    dg_ref[:] = jnp.where(row0, jnp.broadcast_to(dg, (8, d)), 0.0)
    db_ref[:] = jnp.where(row0, jnp.broadcast_to(db, (8, d)), 0.0)


def _pad_rows(x, n_pad):
    if n_pad == x.shape[0]:
        return x
    return jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))


def _fwd(residual, h, gamma, beta, eps, interpret):
    n, d = residual.shape
    n_pad = _cdiv(n, ROW_TILE) * ROW_TILE
    grid = (n_pad // ROW_TILE,)
    row_spec = pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[row_spec, row_spec, vec_spec, vec_spec],
        out_specs=[row_spec, stat_spec, stat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), residual.dtype),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(_pad_rows(residual, n_pad), _pad_rows(h, n_pad),
      gamma[None, :], beta[None, :])
    return out[:n], mean, rstd


def _bwd(residual, h, gamma, mean, rstd, dy, interpret):
    n, d = residual.shape
    n_pad = mean.shape[0]
    grid = (n_pad // ROW_TILE,)
    row_spec = pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((8, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    dx, dg_part, db_part = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, vec_spec, stat_spec,
                  stat_spec],
        out_specs=[row_spec, part_spec, part_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), residual.dtype),
            jax.ShapeDtypeStruct((grid[0] * 8, d), jnp.float32),
            jax.ShapeDtypeStruct((grid[0] * 8, d), jnp.float32),
        ],
        interpret=interpret,
    )(_pad_rows(residual, n_pad), _pad_rows(h, n_pad),
      _pad_rows(dy, n_pad), gamma[None, :], mean, rstd)
    return dx[:n], jnp.sum(dg_part, axis=0), jnp.sum(db_part, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ln_residual_2d(residual, h, gamma, beta, eps, interpret):
    out, _, _ = _fwd(residual, h, gamma, beta, eps, interpret)
    return out


def _vjp_fwd(residual, h, gamma, beta, eps, interpret):
    out, mean, rstd = _fwd(residual, h, gamma, beta, eps, interpret)
    return out, (residual, h, gamma, mean, rstd)


def _vjp_bwd(eps, interpret, res, dy):
    residual, h, gamma, mean, rstd = res
    dx, dg, db = _bwd(residual, h, gamma, mean, rstd, dy, interpret)
    # d(residual + h) flows identically to both addends
    return dx, dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


_ln_residual_2d.defvjp(_vjp_fwd, _vjp_bwd)


def layer_norm_residual(residual, h, gamma, beta, eps=1e-6,
                        interpret=None):
    """LayerNorm(residual + h) over the last axis, one fused VMEM pass.

    residual/h: [..., D]; gamma/beta: [D]. Matches
    flax.linen.LayerNorm(epsilon=eps) applied to (residual + h) to f32
    reduction precision.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = residual.shape
    d = shape[-1]
    out = _ln_residual_2d(residual.reshape(-1, d), h.reshape(-1, d),
                          gamma, beta, eps, interpret)
    return out.reshape(shape)
