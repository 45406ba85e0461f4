"""Pallas flash attention (tiled online-softmax) for TPU — forward + backward.

BASELINE.json pins "attention ... as Pallas kernels". Forward is a classic
flash kernel: grid (B, H, q_tiles, k_tiles), K/V streamed through VMEM,
online max/sum renormalization in VMEM scratch, O(T) memory — the [Tq, Tk]
score matrix never hits HBM. It additionally emits the per-row logsumexp
so the backward can rebuild probabilities tile-by-tile.

Backward is the standard flash-2 pair of kernels, also O(T) memory:
  dq  : grid (B, H, q_tiles, k_tiles), accumulates ds @ K over key tiles
  dk/dv: grid (B, H, k_tiles, q_tiles), accumulates ds^T @ Q and p^T @ dO
with p recomputed in-kernel as exp(s - lse) and
ds = p * (dO V^T - rowsum(dO*O)) * scale (delta precomputed host-side in
XLA, it fuses into the surrounding graph).

Handles the two mask shapes this framework uses (key-padding via lengths,
and causal); arbitrary additive biases fall back to the XLA path in
tpu_asr.models.attention. Fully-masked rows (dummy batch rows with length
0) produce p == 0 everywhere, so their gradients vanish exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Tuned on v5e at T=4096 (b=8, h=8, dh=64): 512x512 tiles run ~1.5x faster
# than XLA's fused attention in both f32 and bf16 (128x128 tiles are badly
# overhead-bound — too many tiny grid programs).
DEFAULT_TQ = 512
DEFAULT_TK = 512
# Backward tiles tuned on v5e at T=4096 (b=8, h=8, dh=64): (1024, 512)
# gives 22ms bf16 / 25ms f32 fwd+bwd vs 62-63ms for XLA recompute (~2.7x),
# with 8-14x less temp HBM; larger tiles fail to fit VMEM in f32.
DEFAULT_BWD_TQ = 1024
DEFAULT_BWD_TK = 512


def _cdiv(a, b):
    return (a + b - 1) // b


def _masked_scores(q, k, kv, scale, causal, iq, ik, tq, tk):
    """[TQ, TK] scaled scores with key-padding (+ causal) masking applied."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = jnp.where(kv[None, :] > 0.5, s, NEG_INF)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0) + iq * tq
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1) + ik * tk
        s = jnp.where(rows >= cols, s, NEG_INF)
    return s


def _flash_kernel(q_ref, k_ref, v_ref, kvalid_ref, o_ref, lse_ref,
                  m_scr, l_scr, acc_scr, *, scale, causal, tq, tk, n_k):
    ik = pl.program_id(3)
    iq = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def compute():
        q = q_ref[0, 0]                       # [TQ, dh]
        k = k_ref[0, 0]                       # [TK, dh]
        v = v_ref[0, 0]
        kv = kvalid_ref[0, 0]                 # [TK] f32 (1 = valid)
        s = _masked_scores(q, k, kv, scale, causal, iq, ik, tq, tk)
        m_prev = m_scr[:]                     # [TQ, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        # all-masked rows: keep m at NEG_INF but avoid exp overflow
        m_safe = jnp.maximum(m_new, NEG_INF / 2)
        p = jnp.exp(s - m_safe)
        p = jnp.where(s <= NEG_INF / 2, 0.0, p)
        corr = jnp.exp(jnp.maximum(m_prev, NEG_INF / 2) - m_safe)
        corr = jnp.where(m_prev <= NEG_INF / 2, 0.0, corr)
        l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * corr + pv
        m_scr[:] = m_new

    if causal:
        # skip key tiles strictly above the diagonal
        @pl.when(ik * tk <= iq * tq + tq - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(ik == n_k - 1)
    def _():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)
        m = m_scr[:]
        lse = jnp.where(m <= NEG_INF / 2, NEG_INF, m + jnp.log(l))
        lse_ref[0, 0] = lse


def _flash_forward(q, k, v, kv_valid, causal, tq_blk, tk_blk, interpret):
    """q/k/v: [B, H, T, dh]; returns (out [B,H,Tq,dh], lse [B,H,Tq,1])."""
    b, h, tq_len, dh = q.shape
    tk_len = k.shape[2]
    n_q = _cdiv(tq_len, tq_blk)
    n_k = _cdiv(tk_len, tk_blk)
    scale = 1.0 / (dh ** 0.5)
    kernel = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, causal=causal,
                          tq=tq_blk, tk=tk_blk, n_k=n_k),
        grid=(b, h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, tq_blk, dh),
                         lambda b_, h_, iq, ik: (b_, h_, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_blk, dh),
                         lambda b_, h_, iq, ik: (b_, h_, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_blk, dh),
                         lambda b_, h_, iq, ik: (b_, h_, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_blk),
                         lambda b_, h_, iq, ik: (b_, 0, ik),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tq_blk, dh),
                         lambda b_, h_, iq, ik: (b_, h_, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq_blk, 1),
                         lambda b_, h_, iq, ik: (b_, h_, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n_q * tq_blk, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, n_q * tq_blk, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq_blk, 1), jnp.float32),
            pltpu.VMEM((tq_blk, 1), jnp.float32),
            pltpu.VMEM((tq_blk, dh), jnp.float32),
        ],
        interpret=interpret,
    )
    out, lse = kernel(q, k, v, kv_valid)
    return out[:, :, :tq_len], lse[:, :, :tq_len]


def _rebuild_p_ds(q, k, v, do, lse, delta, kv, scale, causal, iq, ik, tq, tk):
    """Recompute p = exp(s - lse) and ds = p*(dO V^T - delta)*scale."""
    s = _masked_scores(q, k, kv, scale, causal, iq, ik, tq, tk)
    lse_safe = jnp.maximum(lse, NEG_INF / 2)      # [TQ, 1]
    p = jnp.exp(s - lse_safe)
    p = jnp.where(s <= NEG_INF / 2, 0.0, p)       # [TQ, TK]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)       # [TQ, TK]
    ds = p * (dp - delta) * scale
    return p, ds


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         kvalid_ref, dq_ref, dq_scr,
                         *, scale, causal, tq, tk, n_k):
    ik = pl.program_id(3)
    iq = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    def compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        _, ds = _rebuild_p_ds(q, k, v_ref[0, 0], do_ref[0, 0], lse_ref[0, 0],
                              delta_ref[0, 0], kvalid_ref[0, 0],
                              scale, causal, iq, ik, tq, tk)
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        @pl.when(ik * tk <= iq * tq + tq - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(ik == n_k - 1)
    def _():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          kvalid_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                          *, scale, causal, tq, tk, n_q):
    iq = pl.program_id(3)
    ik = pl.program_id(2)

    @pl.when(iq == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    def compute():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        p, ds = _rebuild_p_ds(q, k_ref[0, 0], v_ref[0, 0], do, lse_ref[0, 0],
                              delta_ref[0, 0], kvalid_ref[0, 0],
                              scale, causal, iq, ik, tq, tk)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        @pl.when(ik * tk <= iq * tq + tq - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(iq == n_q - 1)
    def _():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, do, lse, delta, kv_valid, causal,
                    tq_blk, tk_blk, interpret):
    """All tensors [B, H, T, dh] (lse/delta [B, H, Tq, 1]); returns dq/dk/dv."""
    b, h, tq_len, dh = q.shape
    tk_len = k.shape[2]
    n_q = _cdiv(tq_len, tq_blk)
    n_k = _cdiv(tk_len, tk_blk)
    scale = 1.0 / (dh ** 0.5)

    q_spec = pl.BlockSpec((1, 1, tq_blk, dh),
                          lambda b_, h_, iq, ik: (b_, h_, iq, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, 1, tk_blk, dh),
                          lambda b_, h_, iq, ik: (b_, h_, ik, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, tq_blk, 1),
                            lambda b_, h_, iq, ik: (b_, h_, iq, 0),
                            memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, tk_blk),
                           lambda b_, h_, iq, ik: (b_, 0, ik),
                           memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, causal=causal,
                          tq=tq_blk, tk=tk_blk, n_k=n_k),
        grid=(b, h, n_q, n_k),
        in_specs=[q_spec, k_spec, k_spec, q_spec, row_spec, row_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, n_q * tq_blk, dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((tq_blk, dh), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, delta, kv_valid)

    # dkv grid puts q-tiles innermost so the accumulators live across them.
    qt_spec = pl.BlockSpec((1, 1, tq_blk, dh),
                           lambda b_, h_, ik, iq: (b_, h_, iq, 0),
                           memory_space=pltpu.VMEM)
    kt_spec = pl.BlockSpec((1, 1, tk_blk, dh),
                           lambda b_, h_, ik, iq: (b_, h_, ik, 0),
                           memory_space=pltpu.VMEM)
    rowt_spec = pl.BlockSpec((1, 1, tq_blk, 1),
                             lambda b_, h_, ik, iq: (b_, h_, iq, 0),
                             memory_space=pltpu.VMEM)
    kvt_spec = pl.BlockSpec((1, 1, tk_blk),
                            lambda b_, h_, ik, iq: (b_, 0, ik),
                            memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, causal=causal,
                          tq=tq_blk, tk=tk_blk, n_q=n_q),
        grid=(b, h, n_k, n_q),
        in_specs=[qt_spec, kt_spec, kt_spec, qt_spec, rowt_spec, rowt_spec,
                  kvt_spec],
        out_specs=[kt_spec, kt_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n_k * tk_blk, dh), k.dtype),
            jax.ShapeDtypeStruct((b, h, n_k * tk_blk, dh), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((tk_blk, dh), jnp.float32),
                        pltpu.VMEM((tk_blk, dh), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, delta, kv_valid)
    return dq[:, :, :tq_len], dk[:, :, :tk_len], dv[:, :, :tk_len]


def _xla_attention(q, k, v, kv_valid, causal):
    """Reference einsum attention on [B, Tq, H, dh] layout (fallback path)."""
    dh = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / (dh ** 0.5)
    mask = kv_valid[:, None, None, :] > 0.5
    if causal:
        tq, tk = s.shape[-2], s.shape[-1]
        mask = mask & (jnp.arange(tq)[:, None] >= jnp.arange(tk)[None, :])
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).astype(q.dtype)


def _padt(x, blk):
    """Pad time axis (axis 2 of [B, H, T, dh]) to a block multiple."""
    t = x.shape[2]
    pad = _cdiv(t, blk) * blk - t
    if not pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))


def _fwd_impl(q, k, v, kv_valid, causal, interpret):
    """q/k/v [B,T,H,dh] -> (out [B,Tq,H,dh], lse [B,H,Tq,1])."""
    qt = _padt(jnp.moveaxis(q, 2, 1), _blk(q, DEFAULT_TQ))
    tq_blk = _blk(q, DEFAULT_TQ)
    tk_blk = _blk(k, DEFAULT_TK)
    kt = _padt(jnp.moveaxis(k, 2, 1), tk_blk)
    vt = _padt(jnp.moveaxis(v, 2, 1), tk_blk)
    kvp = kv_valid
    pad_k = kt.shape[2] - kv_valid.shape[1]
    if pad_k:
        kvp = jnp.pad(kv_valid, ((0, 0), (0, pad_k)))
    out, lse = _flash_forward(qt, kt, vt, kvp[:, None, :], causal,
                              tq_blk, tk_blk, interpret)
    return jnp.moveaxis(out, 1, 2)[:, : q.shape[1]], lse


def _blk(x, default):
    """Tile size for a [B, T, H, dh] tensor's time axis: the sequence
    length rounded up to a lane-aligned multiple (128), capped at the
    tuned default. Short ASR sequences (e.g. T'=250) get one padded
    256-tile instead of a misaligned 250-tile Mosaic would mask."""
    return min(default, max(_cdiv(x.shape[1], 128) * 128, 128))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, kv_valid, causal, interpret):
    out, _ = _fwd_impl(q, k, v, kv_valid, causal, interpret)
    return out


def _flash_fwd(q, k, v, kv_valid, causal, interpret):
    out, lse = _fwd_impl(q, k, v, kv_valid, causal, interpret)
    return out, (q, k, v, kv_valid, out, lse)


def _flash_bwd(causal, interpret, res, g):
    q, k, v, kv_valid, out, lse = res
    # delta = rowsum(dO * O) per query position: [B, Tq, H] -> [B, H, Tq, 1]
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.moveaxis(delta, 2, 1)[..., None]
    tq_blk = _blk(q, DEFAULT_BWD_TQ)
    tk_blk = _blk(k, DEFAULT_BWD_TK)
    qt = _padt(jnp.moveaxis(q, 2, 1), tq_blk)
    kt = _padt(jnp.moveaxis(k, 2, 1), tk_blk)
    vt = _padt(jnp.moveaxis(v, 2, 1), tk_blk)
    dot = _padt(jnp.moveaxis(g, 2, 1), tq_blk)
    lsep = _padt(lse, tq_blk)          # already [B, H, Tq, 1]
    deltap = _padt(delta, tq_blk)
    kvp = kv_valid
    pad_k = kt.shape[2] - kv_valid.shape[1]
    if pad_k:
        kvp = jnp.pad(kv_valid, ((0, 0), (0, pad_k)))
    dq, dk, dv = _flash_backward(qt, kt, vt, dot, lsep, deltap,
                                 kvp[:, None, :], causal, tq_blk, tk_blk,
                                 interpret)
    dq = jnp.moveaxis(dq, 1, 2)[:, : q.shape[1]]
    dk = jnp.moveaxis(dk, 1, 2)[:, : k.shape[1]]
    dv = jnp.moveaxis(dv, 1, 2)[:, : v.shape[1]]
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, bias=None, kv_valid=None, causal=False,
                    interpret=None):
    """q [B,Tq,H,dh], k/v [B,Tk,H,dh] -> [B,Tq,H,dh].

    Pass kv_valid [B, Tk] (f32/bool) and/or causal=True. A generic additive
    `bias` falls back to XLA attention (models pass masks, not biases, on
    the pallas path).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, tk = k.shape[0], k.shape[1]
    if bias is not None:
        # interpret the two known mask biases; else fall back
        if bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1:
            kv_valid = (bias[:, 0, 0, :] > NEG_INF / 2).astype(jnp.float32)
            if kv_valid.shape[0] == 1 and b > 1:
                kv_valid = jnp.broadcast_to(kv_valid, (b, tk))
        elif (bias.ndim == 4 and bias.shape[0] == 1 and bias.shape[1] == 1
              and bias.shape[2] == bias.shape[3] == tk):
            causal = True  # our causal self-attention bias
            kv_valid = jnp.ones((b, tk), jnp.float32)
        else:
            return _xla_attention(
                q, k, v, jnp.ones((b, tk), jnp.float32), causal)
    if kv_valid is None:
        kv_valid = jnp.ones((b, tk), jnp.float32)
    kv_valid = kv_valid.astype(jnp.float32)
    return _flash(q, k, v, kv_valid, causal, interpret)
