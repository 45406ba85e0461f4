"""Integration: overfit a tiny synthetic set through the REAL stack
(waveform -> on-device frontend -> model -> loss -> optax) for each
objective, then decode it back exactly. SURVEY.md section 4's integration
strategy; mirrors 'watch cv loss fall, then check decode' from the
reference recipe, shrunk to CI size."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_asr import IGNORE_ID
from tpu_asr.data.synthetic import make_synthetic_dataset
from tpu_asr.frontend import FrontendConfig, wav_to_features
from tpu_asr.models import CifModel, ModelConfig, Transformer
from tpu_asr.train import TrainState, make_optimizer, make_train_step

pytestmark = pytest.mark.slow

VOCAB = 16
FCFG = FrontendConfig()
SMALL = dict(vocab_size=VOCAB, d_input=80, d_model=64, d_inner=128,
             num_heads=2, num_enc_layers=2, num_dec_layers=2, dropout=0.0)


def synth_batch(n=8, seed=0, max_tokens=5):
    utts, waves = make_synthetic_dataset(
        n, VOCAB, min_tokens=2, max_tokens=max_tokens, tone_ms=200, seed=seed)
    smax = max(u.num_samples for u in utts)
    umax = max(u.num_tokens for u in utts)
    wav = np.zeros((n, smax), np.float32)
    wl = np.zeros(n, np.int32)
    targets = np.full((n, umax), IGNORE_ID, np.int32)
    tl = np.zeros(n, np.int32)
    for i, u in enumerate(utts):
        wav[i, : u.num_samples] = waves[u.id]
        wl[i] = u.num_samples
        targets[i, : u.num_tokens] = u.tokens
        tl[i] = u.num_tokens
    feats, flens = wav_to_features(jnp.asarray(wav), jnp.asarray(wl), FCFG)
    return {"feats": feats, "feat_lengths": flens,
            "targets": jnp.asarray(targets),
            "target_lengths": jnp.asarray(tl)}, utts


def overfit(model, batch, steps=400, k=1.0, warmup=100):
    tx = make_optimizer(model.cfg.d_model, warmup_steps=warmup, k=k)
    variables = model.init(jax.random.PRNGKey(0), batch["feats"],
                           batch["feat_lengths"], batch["targets"],
                           batch["target_lengths"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, donate=False)
    first = last = None
    for i in range(steps):
        state, m = step(state, batch)
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    return state, first, last


def test_overfit_ctc_and_exact_greedy_decode():
    cfg = ModelConfig(**SMALL, model_type="ctc")
    batch, utts = synth_batch()
    model = Transformer(cfg)
    state, first, last = overfit(model, batch)
    assert last < first * 0.05, (first, last)
    from tpu_asr.decode.greedy_ctc import ctc_greedy_decode
    params = {"params": state.params}
    enc, el = model.apply(params, batch["feats"], batch["feat_lengths"],
                          method=Transformer.encode)
    logits = model.apply(params, enc, method=Transformer.ctc_logits)
    toks, lens = ctc_greedy_decode(logits, el)
    toks, lens = np.asarray(toks), np.asarray(lens)
    for i, u in enumerate(utts):
        assert toks[i, : lens[i]].tolist() == u.tokens, (i, u.tokens)


def test_overfit_hybrid_and_beam_decode():
    cfg = ModelConfig(**SMALL, model_type="hybrid", ctc_weight=0.3)
    batch, utts = synth_batch()
    model = Transformer(cfg)
    state, first, last = overfit(model, batch)
    # label smoothing floors CE around 0.6 nats at V=16 — threshold allows it
    assert last < first * 0.25, (first, last)
    params = {"params": state.params}
    from tpu_asr.decode.beam import BeamConfig, attention_beam_search
    from tpu_asr.models.decoder import Decoder
    enc, el = model.apply(params, batch["feats"], batch["feat_lengths"],
                          method=Transformer.encode)
    dec = Decoder(cfg)
    dp = {"params": state.params["decoder"]}
    ctc_logits = model.apply(params, enc, method=Transformer.ctc_logits)
    ctc_logp = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), -1)
    out = attention_beam_search(
        dec, dp, enc, el, VOCAB - 2, VOCAB - 1,
        BeamConfig(beam=4, max_len=8, ctc_weight=0.3), ctc_logp=ctc_logp)
    correct = 0
    for i, u in enumerate(utts):
        L = int(out["lengths"][i, 0])
        hyp = np.asarray(out["tokens"][i, 0, :L]).tolist()
        correct += hyp == u.tokens
    assert correct >= len(utts) - 2, correct


def test_overfit_cif_and_decode():
    # CTC auxiliary (as the eastonYi CIF trains) stabilizes the encoder;
    # without it the tiny-scale overfit collapses to a mode. 1500 steps
    # reaches 8/8 exact free decode on the 8-device CPU mesh.
    cfg = ModelConfig(**SMALL, model_type="cif", ctc_weight=0.5,
                      cif_quantity_weight=2.0)
    batch, utts = synth_batch()
    model = CifModel(cfg)
    state, first, last = overfit(model, batch, steps=1500)
    assert last < first * 0.25, (first, last)
    from tpu_asr.decode.cif_decode import cif_greedy_decode
    params = {"params": state.params}
    # reconstruct wav batch for decode path (feats already computed fine)
    tokens, lengths = cif_greedy_decode(
        model, params, batch["feats"], batch["feat_lengths"], max_len=8)
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    correct = sum(
        tokens[i, : lengths[i]].tolist() == u.tokens
        for i, u in enumerate(utts))
    # CIF fire-count estimation is the weak link at this tiny scale; most
    # utterances must still round-trip exactly
    assert correct >= len(utts) - 2, (correct, tokens, lengths)
