"""Model-layer tests: shapes, padding invariance, causality, and exactness
of the cached decode step vs the teacher-forced pass."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_asr import IGNORE_ID
from tpu_asr.models import (CifModel, ModelConfig, Transformer, add_sos_eos)

CFG = ModelConfig(vocab_size=20, d_input=8, d_model=32, d_inner=64,
                  num_heads=2, num_enc_layers=2, num_dec_layers=2,
                  dropout=0.0, model_type="hybrid")


def make_batch(rng, b=2, t=37, u=5):
    feats = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    feat_lengths = jnp.asarray([t, t - 10])
    targets = np.full((b, u), IGNORE_ID, np.int32)
    tl = [5, 3]
    for i, n in enumerate(tl):
        targets[i, :n] = rng.integers(2, 18, n)
    return feats, feat_lengths, jnp.asarray(targets), jnp.asarray(tl)


def test_add_sos_eos():
    targets = jnp.asarray([[3, 4, IGNORE_ID]])
    ys_in, ys_out = add_sos_eos(targets, jnp.asarray([2]), 18, 19)
    assert ys_in.tolist() == [[18, 3, 4, 19]]
    assert ys_out.tolist() == [[3, 4, 19, IGNORE_ID]]


def test_transformer_forward_and_losses(rng):
    feats, fl, targets, tl = make_batch(rng)
    model = Transformer(CFG)
    params = model.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    out = model.apply(params, feats, fl, targets, tl)
    for k in ("loss", "loss_att", "loss_ctc", "acc"):
        assert k in out and np.isfinite(float(out[k])), k
    lam = CFG.ctc_weight
    np.testing.assert_allclose(
        float(out["loss"]),
        lam * float(out["loss_ctc"]) + (1 - lam) * float(out["loss_att"]),
        rtol=1e-6)


@pytest.mark.parametrize("model_type", ["hybrid", "cif"])
def test_dummy_row_masking(rng, model_type):
    """Static-batch padding: appending dummy rows (feat_lengths == 0,
    IGNORE targets) must leave every loss IDENTICAL and keep gradients
    finite — this is what lets the loader pad partial batches to the
    bucket's batch_size for the dp mesh."""
    feats, fl, targets, tl = make_batch(rng)
    cfg = ModelConfig(**{**CFG.__dict__, "model_type": model_type,
                         "ctc_weight": 0.3})
    model = CifModel(cfg) if model_type == "cif" else Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    out_real = model.apply(params, feats, fl, targets, tl)

    n_pad = 2
    feats_p = jnp.concatenate(
        [feats, jnp.zeros((n_pad,) + feats.shape[1:], feats.dtype)])
    fl_p = jnp.concatenate([fl, jnp.zeros((n_pad,), fl.dtype)])
    targets_p = jnp.concatenate(
        [targets, jnp.full((n_pad, targets.shape[1]), IGNORE_ID,
                           targets.dtype)])
    tl_p = jnp.concatenate([tl, jnp.zeros((n_pad,), tl.dtype)])
    out_pad = model.apply(params, feats_p, fl_p, targets_p, tl_p)
    for k in out_real:
        np.testing.assert_allclose(float(out_real[k]), float(out_pad[k]),
                                   rtol=1e-5, err_msg=k)


@pytest.mark.slow
@pytest.mark.parametrize("model_type", ["hybrid", "cif"])
def test_dummy_row_grads_finite(rng, model_type):
    """Gradients through a dummy-row-padded batch stay finite (slow tier:
    compiles the backward pass; the loss-identity half is fast)."""
    feats, fl, targets, tl = make_batch(rng)
    cfg = ModelConfig(**{**CFG.__dict__, "model_type": model_type,
                         "ctc_weight": 0.3})
    model = CifModel(cfg) if model_type == "cif" else Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    n_pad = 2
    feats_p = jnp.concatenate(
        [feats, jnp.zeros((n_pad,) + feats.shape[1:], feats.dtype)])
    fl_p = jnp.concatenate([fl, jnp.zeros((n_pad,), fl.dtype)])
    targets_p = jnp.concatenate(
        [targets, jnp.full((n_pad, targets.shape[1]), IGNORE_ID,
                           targets.dtype)])
    tl_p = jnp.concatenate([tl, jnp.zeros((n_pad,), tl.dtype)])

    def loss_fn(p):
        return model.apply(p, feats_p, fl_p, targets_p, tl_p)["loss"]

    grads = jax.grad(loss_fn)(params)
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        assert np.isfinite(np.asarray(g)).all(), path


def test_encoder_padding_invariance(rng):
    """Extending time padding must not change valid outputs or losses."""
    feats, fl, targets, tl = make_batch(rng, t=37)
    model = Transformer(CFG)
    params = model.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    enc1, el1 = model.apply(params, feats, fl, method=Transformer.encode)
    feats_pad = jnp.concatenate(
        [feats, jnp.zeros((feats.shape[0], 12, feats.shape[2]))], axis=1)
    enc2, el2 = model.apply(params, feats_pad, fl, method=Transformer.encode)
    assert (np.asarray(el1) == np.asarray(el2)).all()
    t1 = enc1.shape[1]
    np.testing.assert_allclose(np.asarray(enc1), np.asarray(enc2)[:, :t1],
                               atol=2e-5)
    out1 = model.apply(params, feats, fl, targets, tl)
    out2 = model.apply(params, feats_pad, fl, targets, tl)
    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=1e-5)


def test_decoder_step_matches_teacher_forced(rng):
    """The cached incremental decode must reproduce full-pass logits."""
    feats, fl, targets, tl = make_batch(rng)
    model = Transformer(CFG)
    params = model.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    enc_out, enc_lengths = model.apply(params, feats, fl,
                                       method=Transformer.encode)
    ys_in, _ = add_sos_eos(targets, tl, model_sos(CFG), model_eos(CFG))
    full_logits = model.apply(params, enc_out, enc_lengths, ys_in,
                              method=Transformer.decode_logits)

    dec_params = {"params": params["params"]["decoder"]}
    from tpu_asr.models.decoder import Decoder
    dec = Decoder(CFG)
    b, u = ys_in.shape
    cache = dec.apply(dec_params, b, u, method=Decoder.init_cache)
    cross_kv = dec.apply(dec_params, enc_out,
                         method=Decoder.precompute_cross_kv)
    step_logits = []
    for pos in range(u):
        lg, cache = dec.apply(dec_params, ys_in[:, pos], pos, cache,
                              cross_kv, enc_lengths, method=Decoder.step)
        step_logits.append(lg)
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(full_logits), atol=2e-4)


def model_sos(cfg):
    return cfg.vocab_size - 2


def model_eos(cfg):
    return cfg.vocab_size - 1


def test_decoder_causality(rng):
    """Changing a future target token must not affect earlier logits."""
    feats, fl, targets, tl = make_batch(rng)
    model = Transformer(CFG)
    params = model.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    enc_out, el = model.apply(params, feats, fl, method=Transformer.encode)
    ys_in, _ = add_sos_eos(targets, tl, model_sos(CFG), model_eos(CFG))
    lg1 = model.apply(params, enc_out, el, ys_in,
                      method=Transformer.decode_logits)
    ys_in2 = ys_in.at[:, -1].set(7)
    lg2 = model.apply(params, enc_out, el, ys_in2,
                      method=Transformer.decode_logits)
    np.testing.assert_allclose(np.asarray(lg1[:, :-1]),
                               np.asarray(lg2[:, :-1]), atol=1e-6)


def test_ctc_only_model(rng):
    cfg = ModelConfig(**{**CFG.__dict__, "model_type": "ctc"})
    feats, fl, targets, tl = make_batch(rng)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    out = model.apply(params, feats, fl, targets, tl)
    assert "loss_ctc" in out and "loss_att" not in out
    np.testing.assert_allclose(float(out["loss"]), float(out["loss_ctc"]))


@pytest.mark.slow
def test_cif_model_forward(rng):
    cfg = ModelConfig(**{**CFG.__dict__, "model_type": "cif",
                         "ctc_weight": 0.5})
    feats, fl, targets, tl = make_batch(rng)
    model = CifModel(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    out = model.apply(params, feats, fl, targets, tl)
    for k in ("loss", "loss_att", "loss_qty", "loss_ctc", "acc"):
        assert k in out and np.isfinite(float(out[k])), k
    # grads flow to the assigner through both qty loss and the fire matmul
    def lossfn(p):
        return model.apply(p, feats, fl, targets, tl)["loss"]
    g = jax.grad(lossfn)(params)
    leaf = g["params"]["assigner"]["conv"]["kernel"]
    assert float(jnp.abs(leaf).sum()) > 0


def test_linear_input_layer(rng):
    cfg = ModelConfig(**{**CFG.__dict__, "input_layer": "linear",
                         "d_input": 8, "lfr_m": 1, "lfr_n": 1,
                         "model_type": "transformer"})
    feats, fl, targets, tl = make_batch(rng)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    out = model.apply(params, feats, fl, targets, tl)
    assert np.isfinite(float(out["loss"]))
