"""Multi-head scaled-dot-product attention.

Reference: src/transformer/attention.py (`MultiHeadAttention`,
`ScaledDotProductAttention`): h=8 heads, d_k=d_v=64, mask as -inf before
softmax. Here the residual+LayerNorm wiring lives in the encoder/decoder
layers; this module is projections + attention core only, so the same
parameters serve both the full teacher-forced pass and the single-token
cached decode step (beam search runs fully on device).

The attention core dispatches to the Pallas flash kernel
(tpu_asr.ops.pallas.flash_attention) when cfg.use_pallas is set; the XLA
einsum path is the fallback and the numerical reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e30


def attend(q, k, v, bias=None, dtype=jnp.float32):
    """q [B,Tq,H,dh], k/v [B,Tk,H,dh], bias broadcastable to [B,H,Tq,Tk]."""
    dh = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(dh, dtype=jnp.float32)).astype(q.dtype)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """boolean mask (True = attend allowed) -> additive bias."""
    return jnp.where(mask, 0.0, NEG_INF).astype(dtype)


class MultiHeadAttention(nn.Module):
    num_heads: int
    d_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        dense = lambda name: nn.DenseGeneral(
            (self.num_heads, self.d_model // self.num_heads),
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = nn.DenseGeneral(
            self.d_model, axis=(-2, -1), dtype=self.dtype,
            param_dtype=self.param_dtype, name="out_proj")

    def __call__(self, q_in, kv_in, bias=None, deterministic: bool = True):
        q = self.q_proj(q_in)
        k = self.k_proj(kv_in)
        v = self.v_proj(kv_in)
        if self.use_pallas:
            from tpu_asr.ops.pallas.flash_attention import flash_attention
            out = flash_attention(q, k, v, bias=bias)
        else:
            out = attend(q, k, v, bias, dtype=self.dtype)
        return self.out_proj(out)

    def project_kv(self, kv_in):
        """Precompute cross-attention K/V once per utterance for decoding."""
        return self.k_proj(kv_in), self.v_proj(kv_in)

    def step(self, q_in, k_cache, v_cache, bias=None):
        """Single-position query against a precomputed/accumulated cache.

        q_in: [B, 1, D]; k_cache/v_cache: [B, Tk, H, dh].
        """
        q = self.q_proj(q_in)
        out = attend(q, k_cache, v_cache, bias, dtype=self.dtype)
        return self.out_proj(out)

    def project_kv_step(self, kv_t):
        """Project a single new position's K/V for self-attn cache append."""
        return self.k_proj(kv_t), self.v_proj(kv_t)
