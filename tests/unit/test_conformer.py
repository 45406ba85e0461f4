"""Conformer encoder tests: rel-shift vs explicit-gather oracle, padding
invariance, chunked causality (causal conv + chunk mask => per-chunk
finality), objective compatibility (hybrid + transducer), and training
descent. Covers tpu_asr/models/conformer.py + the encoder wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.models import ModelConfig, Transformer, build_model
from tpu_asr.models.conformer import rel_shift, rel_sinusoid_table
from tpu_asr.models.encoder import Encoder


def conf_cfg(**kw):
    base = dict(vocab_size=14, d_model=16, d_inner=32, num_heads=2,
                num_enc_layers=2, num_dec_layers=1, conv_channels=4,
                dropout=0.0, model_type="hybrid", ctc_weight=0.3,
                encoder_type="conformer", conv_kernel=5)
    base.update(kw)
    return ModelConfig(**base)


def test_rel_shift_matches_gather_oracle():
    rng = np.random.default_rng(0)
    b, h, t = 2, 3, 9
    x = jnp.asarray(rng.standard_normal((b, h, t, 2 * t - 1)).astype("f4"))
    got = np.asarray(rel_shift(x))
    idx = (t - 1) + (np.arange(t)[None, :] - np.arange(t)[:, None])
    want = np.asarray(x)[:, :, np.arange(t)[:, None], idx]
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_rel_table_convention():
    t, d = 6, 8
    tab = rel_sinusoid_table(t, d)
    assert tab.shape == (2 * t - 1, d)
    # center row is distance 0: sin(0)=0 on even dims, cos(0)=1 on odd
    np.testing.assert_allclose(tab[t - 1, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(tab[t - 1, 1::2], 1.0, atol=1e-7)


def _enc_params(cfg, t=60, seed=0):
    enc = Encoder(cfg)
    feats = jnp.zeros((1, t, cfg.d_input), jnp.float32)
    v = enc.init(jax.random.PRNGKey(seed), feats,
                 jnp.full((1,), t, jnp.int32))
    return enc, v


def test_encoder_padding_invariance():
    rng = np.random.default_rng(1)
    cfg = conf_cfg()
    enc, v = _enc_params(cfg)
    feats = rng.standard_normal((2, 60, 80)).astype(np.float32)
    lens = np.array([60, 41], np.int32)
    out1, el1 = enc.apply(v, jnp.asarray(feats), jnp.asarray(lens))
    wide = np.concatenate(
        [feats, rng.standard_normal((2, 24, 80)).astype("f4")], axis=1)
    out2, el2 = enc.apply(v, jnp.asarray(wide), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(el1), np.asarray(el2))
    t1 = out1.shape[1]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2)[:, :t1],
                               rtol=2e-5, atol=2e-5)


def test_chunked_conformer_is_causal_per_chunk():
    """With enc_chunk_size > 0 the conv module is causal and attention is
    chunk-masked: appending future audio must not change completed
    chunks' outputs."""
    rng = np.random.default_rng(2)
    cfg = conf_cfg(enc_chunk_size=4)
    enc, v = _enc_params(cfg)
    feats = rng.standard_normal((1, 80, 80)).astype(np.float32)
    full, el = enc.apply(v, jnp.asarray(feats), jnp.asarray([80], np.int32))
    # a prefix of the audio: its complete chunks must match bitwise-close
    pre_frames = 48
    pre, el_p = enc.apply(v, jnp.asarray(feats[:, :pre_frames]),
                          jnp.asarray([pre_frames], np.int32))
    n = (int(el_p[0]) // cfg.enc_chunk_size) * cfg.enc_chunk_size
    np.testing.assert_allclose(np.asarray(pre)[:, :n],
                               np.asarray(full)[:, :n],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_conformer_under_hybrid_and_transducer():
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((2, 50, 80)).astype(np.float32)
    flens = np.array([50, 38], np.int32)
    targets = rng.integers(1, 11, (2, 4)).astype(np.int32)
    tlens = np.array([4, 3], np.int32)
    for mt, extra in [("hybrid", {}),
                      ("transducer", dict(num_pred_layers=1, d_joint=16))]:
        cfg = conf_cfg(model_type=mt, **extra)
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                            jnp.asarray(flens), jnp.asarray(targets),
                            jnp.asarray(tlens))
        out, grads = jax.value_and_grad(
            lambda p: model.apply(p, jnp.asarray(feats), jnp.asarray(flens),
                                  jnp.asarray(targets),
                                  jnp.asarray(tlens))["loss"])(params)
        assert np.isfinite(float(out)) and float(out) > 0, mt
        gn = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                                for g in jax.tree.leaves(grads))))
        assert np.isfinite(gn) and gn > 0, mt


@pytest.mark.slow
def test_conformer_trains_down():
    from tpu_asr.train import TrainState, make_optimizer
    from tpu_asr.train.loop import make_train_step
    rng = np.random.default_rng(4)
    cfg = conf_cfg()
    model = Transformer(cfg)
    feats = rng.standard_normal((4, 50, 80)).astype(np.float32)
    flens = np.full(4, 50, np.int32)
    targets = rng.integers(1, 11, (4, 4)).astype(np.int32)
    tlens = np.full(4, 4, np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                           jnp.asarray(flens), jnp.asarray(targets),
                           jnp.asarray(tlens))
    tx = make_optimizer(cfg.d_model, warmup_steps=10, k=5.0)
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, donate=False)
    batch = dict(feats=jnp.asarray(feats), feat_lengths=jnp.asarray(flens),
                 targets=jnp.asarray(targets), target_lengths=jnp.asarray(tlens))
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_conformer_encode_chunk_equals_offline():
    """Incremental conformer chunks (KV + conv caches) reproduce the
    offline chunk-masked encoder outputs exactly."""
    rng = np.random.default_rng(5)
    cfg = conf_cfg(enc_chunk_size=4)
    enc, v = _enc_params(cfg)
    t_frames = 128
    feats = rng.standard_normal((1, t_frames, 80)).astype(np.float32)
    full, el = enc.apply(v, jnp.asarray(feats),
                         jnp.asarray([t_frames], np.int32))
    el = int(el[0])
    chunk = cfg.enc_chunk_size
    t_max = ((el + chunk - 1) // chunk) * chunk
    caches = enc.init_cache(1, t_max)
    win = cfg.conv_input_window(chunk)
    stride = cfg.conv_total_stride
    buf = np.zeros((1, t_frames + win, 80), np.float32)
    buf[:, :t_frames] = feats
    got = []
    for k_idx in range(el // chunk):
        window = jnp.asarray(buf[:, stride * k_idx * chunk:
                                 stride * k_idx * chunk + win])
        out, caches = enc.apply(v, window, k_idx, caches, el,
                                method=Encoder.encode_chunk)
        got.append(np.asarray(out))
    got = np.concatenate(got, axis=1)
    n = got.shape[1]
    np.testing.assert_allclose(got, np.asarray(full)[:, :n],
                               rtol=2e-5, atol=2e-5)


def test_conformer_streaming_ctc_equals_offline():
    """End-to-end: StreamingCTCRecognizer over a chunked CONFORMER model
    == offline greedy decode, any push segmentation."""
    from tpu_asr.decode.recognizer import Recognizer
    from tpu_asr.decode.streaming import StreamingCTCRecognizer
    rng = np.random.default_rng(6)
    cfg = conf_cfg(model_type="ctc", num_dec_layers=0, enc_chunk_size=4)
    enc_model = Transformer(cfg)
    feats0 = jnp.zeros((1, 60, 80), jnp.float32)
    params = enc_model.init(jax.random.PRNGKey(0), feats0,
                            jnp.full((1,), 60, jnp.int32),
                            jnp.zeros((1, 4), jnp.int32),
                            jnp.full((1,), 4, jnp.int32))
    t = 150
    feats = (rng.standard_normal((t, 80)) * 3).astype(np.float32)
    offline = Recognizer(cfg=cfg, params=params, mode="greedy_ctc")
    ref = offline.decode_batch({
        "feats": feats[None], "feat_lengths": np.asarray([t], np.int32)})[0]
    rec = StreamingCTCRecognizer(cfg, params, max_frames=256)
    assert rec.incremental          # the KV+conv cached path
    streamed = []
    pos = 0
    for sz in (11, 37, 5, 60, 2, 80):
        take = min(sz, t - pos)
        if take == 0:
            break
        streamed.extend(rec.push(feats[pos: pos + take]))
        pos += take
    hyp = rec.finish()
    assert hyp[: len(streamed)] == streamed
    # Recognizer.clean() drops the (reserved) eos id from hypotheses; the
    # raw streaming token list emits it freely on this random model —
    # compare modulo that filtering.
    assert [x for x in hyp if x != cfg.vocab_size - 1] == ref


def test_conformer_transducer_streaming_equals_offline():
    """The full streaming production stack: chunked CONFORMER encoder +
    transducer greedy, streamed == offline exactly."""
    from tpu_asr.decode.streaming import StreamingTransducerRecognizer
    from tpu_asr.decode.transducer_decode import transducer_greedy_decode
    from tpu_asr.models import TransducerModel
    rng = np.random.default_rng(7)
    cfg = conf_cfg(model_type="transducer", num_pred_layers=1, d_joint=16,
                   enc_chunk_size=4, ctc_weight=0.0)
    model = TransducerModel(cfg)
    feats0 = jnp.zeros((1, 60, 80), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), feats0,
                        jnp.full((1,), 60, jnp.int32),
                        jnp.ones((1, 4), jnp.int32),
                        jnp.full((1,), 4, jnp.int32))
    t = 130
    feats = (rng.standard_normal((t, 80)) * 3).astype(np.float32)
    ref_toks, ref_lens = transducer_greedy_decode(
        model, params, jnp.asarray(feats[None]),
        jnp.asarray([t], np.int32), max_tokens=24)
    ref = [int(x) for x in np.asarray(ref_toks)[0, : int(ref_lens[0])]]
    rec = StreamingTransducerRecognizer(cfg, params, max_frames=256,
                                        max_tokens=24)
    pos = 0
    for sz in (13, 50, 3, 90):
        take = min(sz, t - pos)
        if take == 0:
            break
        rec.push(feats[pos: pos + take])
        pos += take
    assert rec.finish() == ref
