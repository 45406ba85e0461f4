"""Flash attention kernel vs the XLA einsum reference: padding masks,
causal masks, non-multiple-of-block lengths, gradients (recompute path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_asr.ops.pallas.flash_attention import (_xla_attention,
                                                flash_attention)

pytestmark = pytest.mark.slow


def qkv(rng, b=2, tq=50, tk=50, h=2, dh=32):
    q = jnp.asarray(rng.standard_normal((b, tq, h, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, tk, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, tk, h, dh)).astype(np.float32))
    return q, k, v


def test_flash_matches_xla_padding_mask(rng):
    q, k, v = qkv(rng)
    kv_valid = (jnp.arange(50)[None, :] < jnp.asarray([[50], [30]])[:, 0][:, None])
    want = _xla_attention(q, k, v, kv_valid.astype(jnp.float32), False)
    got = flash_attention(q, k, v, kv_valid=kv_valid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_flash_causal(rng):
    q, k, v = qkv(rng, tq=40, tk=40)
    ones = jnp.ones((2, 40), jnp.float32)
    want = _xla_attention(q, k, v, ones, True)
    got = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_flash_bias_interop(rng):
    """The MHA module passes additive biases; the wrapper maps the two
    known shapes onto kernel masks."""
    from tpu_asr.models.attention import mask_to_bias
    q, k, v = qkv(rng)
    valid = jnp.arange(50)[None, :] < jnp.asarray([45, 20])[:, None]
    bias = mask_to_bias(valid[:, None, None, :])
    want = _xla_attention(q, k, v, valid.astype(jnp.float32), False)
    got = flash_attention(q, k, v, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    # causal bias [1,1,U,U]
    from tpu_asr.utils.padding import make_causal_mask
    q2, k2, v2 = qkv(rng, tq=50, tk=50)
    cb = mask_to_bias(make_causal_mask(50)[None, None])
    want2 = _xla_attention(q2, k2, v2, jnp.ones((2, 50), jnp.float32), True)
    got2 = flash_attention(q2, k2, v2, bias=cb, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-4, atol=1e-5)


def test_flash_grads(rng):
    q, k, v = qkv(rng, tq=30, tk=30)
    valid = (jnp.arange(30)[None, :] < jnp.asarray([30, 20])[:, None])

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_valid=valid,
                                       interpret=True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, valid.astype(jnp.float32),
                                      False) ** 2)

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def _grad_pair(q, k, v, valid, causal):
    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_valid=valid,
                                       causal=causal, interpret=True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, valid.astype(jnp.float32),
                                      causal) ** 2)

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    return g1, g2


def test_flash_grads_multitile_causal(rng, monkeypatch):
    """Pallas backward across several q/k tiles with padding remainders,
    causal + key-padding masks together."""
    import tpu_asr.ops.pallas.flash_attention as fa
    for attr in ("DEFAULT_TQ", "DEFAULT_TK", "DEFAULT_BWD_TQ",
                 "DEFAULT_BWD_TK"):
        monkeypatch.setattr(fa, attr, 16)
    q, k, v = qkv(rng, tq=40, tk=40)      # 40 -> 3 tiles of 16, pad 8
    valid = (jnp.arange(40)[None, :] < jnp.asarray([40, 23])[:, None])
    for causal in (False, True):
        g1, g2 = _grad_pair(q, k, v, valid, causal)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_flash_grads_dummy_row(rng):
    """A fully length-0 batch row (loader dummy padding) must get exactly
    zero, finite gradients through the Pallas backward."""
    q, k, v = qkv(rng, b=2, tq=24, tk=24)
    valid = (jnp.arange(24)[None, :] < jnp.asarray([24, 0])[:, None])
    g1, g2 = _grad_pair(q, k, v, valid, False)
    # valid row matches XLA; the XLA oracle is invalid for the all-masked
    # row (its softmax degenerates to uniform attention), where the flash
    # kernel's exactly-zero output/grads are the correct semantics.
    for a, b in zip(g1, g2):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   rtol=1e-4, atol=1e-5)
    # dummy row's grads vanish
    for a in g1:
        np.testing.assert_allclose(np.asarray(a[1]), 0.0, atol=1e-6)


def test_flash_grads_bf16(rng):
    q, k, v = (x.astype(jnp.bfloat16) for x in qkv(rng, tq=32, tk=32))
    valid = (jnp.arange(32)[None, :] < jnp.asarray([32, 17])[:, None])
    g1, g2 = _grad_pair(q, k, v, valid, True)
    for a, b in zip(g1, g2):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_flash_in_encoder(rng):
    """use_pallas=True encoder (interpret mode) == XLA encoder."""
    from tpu_asr.models import ModelConfig, Transformer
    base = dict(vocab_size=16, d_input=8, d_model=32, d_inner=64,
                num_heads=2, num_enc_layers=2, num_dec_layers=2,
                dropout=0.0, model_type="transformer")
    feats = jnp.asarray(rng.standard_normal((2, 37, 8)).astype(np.float32))
    fl = jnp.asarray([37, 25])
    targets = jnp.asarray(rng.integers(2, 14, (2, 4)).astype(np.int32))
    tl = jnp.asarray([4, 4])
    m1 = Transformer(ModelConfig(**base, use_pallas=False))
    params = m1.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    out1 = m1.apply(params, feats, fl, targets, tl)
    m2 = Transformer(ModelConfig(**base, use_pallas=True))
    out2 = m2.apply(params, feats, fl, targets, tl)
    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=1e-4)
