"""Hypothesis-level beam parity: the compiled batched beam search (pure
attention AND joint CTC/attention) must produce the same 1-best token
sequences — and matching scores — as a reference-style host-driven beam
running on the torch twin with identical weights.

This is the WER-parity proxy pinned by BASELINE.json ("WER parity on ...
attention beam search, joint rescoring"): the riskiest redesign is the
on-device static-shape beam (SURVEY.md section 7 hard part 1 — tie
breaking, eos handling, score accumulation), so we pin its hypotheses
against a per-hypothesis python beam loop shaped like the reference's
`Decoder.recognize_beam` (ended hyps set aside, joint scoring via host
CTC prefix scores).

Uses an overfit model: parity on sharp, trained distributions is what WER
parity actually requires (on random weights the argmax chatter is
meaningless and the two beam formulations may legitimately tie-break
differently).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tpu_asr import IGNORE_ID
from tpu_asr.data.synthetic import make_synthetic_dataset
from tpu_asr.decode.beam import BeamConfig, attention_beam_search
from tpu_asr.frontend import FrontendConfig, wav_to_features
from tpu_asr.models import ModelConfig, Transformer
from tpu_asr.models.decoder import Decoder
from tpu_asr.train import TrainState, make_optimizer, make_train_step

pytestmark = pytest.mark.slow

VOCAB = 16
SOS, EOS = VOCAB - 2, VOCAB - 1
CFG = ModelConfig(vocab_size=VOCAB, d_input=80, d_model=64, d_inner=128,
                  num_heads=2, num_enc_layers=2, num_dec_layers=2,
                  dropout=0.0, model_type="hybrid", ctc_weight=0.3)
MAX_LEN = 8


@pytest.fixture(scope="module")
def overfit_setup():
    """Overfit a small hybrid model on synthetic tones; build the torch twin
    with the trained weights imported. Varied utterance/target lengths."""
    n = 8
    utts, waves = make_synthetic_dataset(
        n, VOCAB, min_tokens=2, max_tokens=5, tone_ms=200, seed=7)
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
    feats, flens = wav_to_features(jnp.asarray(wav), jnp.asarray(wl),
                                   FrontendConfig())
    batch = {"feats": feats, "feat_lengths": flens,
             "targets": jnp.asarray(targets), "target_lengths": jnp.asarray(tl)}

    model = Transformer(CFG)
    tx = make_optimizer(CFG.d_model, warmup_steps=100, k=1.0)
    variables = model.init(jax.random.PRNGKey(0), batch["feats"],
                           batch["feat_lengths"], batch["targets"],
                           batch["target_lengths"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, donate=False)
    for _ in range(400):
        state, m = step(state, batch)
    assert float(m["loss"]) < 2.0, float(m["loss"])

    from tpu_asr.parity.torch_twin import (TorchTransformer,
                                           import_flax_params)
    twin = TorchTransformer(CFG)
    import_flax_params(twin, {"params": state.params})
    twin.eval()
    return model, state, batch, twin


def _compiled_beam(model, state, batch, beam, ctc_weight):
    params = {"params": state.params}
    enc, el = model.apply(params, batch["feats"], batch["feat_lengths"],
                          method=Transformer.encode)
    dec = Decoder(CFG)
    dp = {"params": state.params["decoder"]}
    ctc_logp = None
    if ctc_weight > 0:
        ctc_logits = model.apply(params, enc, method=Transformer.ctc_logits)
        ctc_logp = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), -1)
    return attention_beam_search(
        dec, dp, enc, el, SOS, EOS,
        BeamConfig(beam=beam, max_len=MAX_LEN, ctc_weight=ctc_weight),
        ctc_logp=ctc_logp)


def _host_beam(twin, batch, i, beam, ctc_weight):
    feats = torch.tensor(np.asarray(batch["feats"][i : i + 1]))
    fl = torch.tensor(np.asarray(batch["feat_lengths"][i : i + 1],
                                 dtype=np.int64))
    return twin.recognize_beam_joint(feats, fl, beam=beam, max_len=MAX_LEN,
                                     ctc_weight=ctc_weight, nbest=1)


@pytest.mark.parametrize("beam", [1, 5, 10])
@pytest.mark.parametrize("ctc_weight", [0.0, 0.3])
def test_onebest_matches_reference_style_host_beam(overfit_setup, beam,
                                                   ctc_weight):
    model, state, batch, twin = overfit_setup
    out = _compiled_beam(model, state, batch, beam, ctc_weight)
    n = batch["feats"].shape[0]
    for i in range(n):
        host = _host_beam(twin, batch, i, beam, ctc_weight)
        assert host, (i, "host beam returned nothing")
        host_seq, host_score = host[0]
        L = int(out["lengths"][i, 0])
        got_seq = np.asarray(out["tokens"][i, 0, :L]).tolist()
        assert got_seq == host_seq, (i, beam, ctc_weight, got_seq, host_seq)
        np.testing.assert_allclose(float(out["scores"][i, 0]), host_score,
                                   rtol=1e-3, atol=2e-3)
