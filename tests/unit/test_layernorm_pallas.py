"""Fused residual+LayerNorm Pallas kernel vs flax.linen.LayerNorm:
values and gradients (dx to both addends, dgamma, dbeta), including
non-tile-multiple row counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.ops.pallas.layernorm import layer_norm_residual


def _ref(residual, h, gamma, beta, eps=1e-6):
    x = (residual + h).astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + eps)
    return (xhat * gamma + beta).astype(residual.dtype)


@pytest.mark.parametrize("n,d", [(512, 256), (800, 128), (1537, 256)])
def test_values_match_reference(n, d):
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    out = layer_norm_residual(r, h, g, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(r, h, g, b)),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_reference():
    n, d = 800, 128
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    g = jnp.asarray((1 + 0.1 * rng.standard_normal(d)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    def loss_pallas(r, h, g, b):
        return jnp.sum(layer_norm_residual(r, h, g, b, interpret=True) * ct)

    def loss_ref(r, h, g, b):
        return jnp.sum(_ref(r, h, g, b) * ct)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(r, h, g, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(r, h, g, b)
    for a, e, name in zip(gp, gr, ("dres", "dh", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_bf16_roundtrip_shape_and_finite():
    n, d = 520, 128   # pads to 1024 rows
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal((4, 130, d)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    h = jnp.zeros_like(r)
    g = jnp.ones(d, jnp.float32)
    b = jnp.zeros(d, jnp.float32)
    out = layer_norm_residual(r, h, g, b, interpret=True)
    assert out.shape == r.shape and out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


@pytest.mark.slow
def test_model_equivalence_with_flag():
    """Same params, pallas_layernorm on/off -> equal hybrid losses.
    (Slow tier: compiles the full hybrid model twice; the kernel-level
    equivalence tests above stay fast.)"""
    from tpu_asr.models import ModelConfig, Transformer
    import dataclasses
    cfg = ModelConfig(vocab_size=16, d_input=80, d_model=128, d_inner=128,
                      num_heads=2, num_enc_layers=1, num_dec_layers=1,
                      dropout=0.0, model_type="hybrid")
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((16, 200, 80)).astype(np.float32))
    flens = jnp.full((16,), 200, jnp.int32)
    ys = jnp.asarray(rng.integers(2, 14, (16, 6)).astype(np.int32))
    yls = jnp.full((16,), 6, jnp.int32)
    # 16 x T'=49 = 784 rows >= 512: the encoder actually takes the kernel
    m0 = Transformer(cfg)
    params = m0.init(jax.random.PRNGKey(0), feats, flens, ys, yls)
    out0 = m0.apply(params, feats, flens, ys, yls)
    m1 = Transformer(dataclasses.replace(cfg, pallas_layernorm=True))
    out1 = m1.apply(params, feats, flens, ys, yls)
    np.testing.assert_allclose(float(out0["loss"]), float(out1["loss"]),
                               rtol=1e-5)
