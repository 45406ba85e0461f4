"""LFR (linear-input) path end-to-end: train step + recognizer with the
reference's LFR(4,3) front-end."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_asr import IGNORE_ID
from tpu_asr.decode.beam import BeamConfig
from tpu_asr.decode.recognizer import Recognizer
from tpu_asr.frontend import FrontendConfig
from tpu_asr.models import ModelConfig, Transformer
from tpu_asr.train import TrainState, make_optimizer, make_train_step
from tpu_asr.train.loop import apply_lfr, batch_features

pytestmark = pytest.mark.slow

CFG = ModelConfig(vocab_size=16, d_input=80, d_model=32, d_inner=64,
                  num_heads=2, num_enc_layers=1, num_dec_layers=1,
                  dropout=0.0, model_type="hybrid", input_layer="linear",
                  lfr_m=4, lfr_n=3)


def make_batch(rng, b=2):
    wav = jnp.asarray(rng.standard_normal((b, 8000)).astype(np.float32))
    targets = jnp.asarray(rng.integers(2, 14, (b, 4)).astype(np.int32))
    return {"wav": wav, "wav_lengths": jnp.asarray([8000, 6000]),
            "targets": targets, "target_lengths": jnp.asarray([4, 4])}


def test_lfr_train_step(rng):
    fcfg = FrontendConfig()
    batch = make_batch(rng)
    feats, flens = batch_features(batch, fcfg)
    feats, flens = apply_lfr(feats, flens, (4, 3))
    assert feats.shape[-1] == 320  # 4 x 80
    model = Transformer(CFG)
    variables = model.init(jax.random.PRNGKey(0), feats, flens,
                           batch["targets"], batch["target_lengths"])
    tx = make_optimizer(CFG.d_model)
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, frontend=fcfg, lfr=(4, 3),
                           donate=False)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))

    rec = Recognizer(cfg=CFG, params={"params": state.params},
                     beam=BeamConfig(beam=2, max_len=5), mode="joint",
                     frontend=fcfg)
    hyps = rec.decode_batch({"wav": batch["wav"],
                             "wav_lengths": batch["wav_lengths"]})
    assert len(hyps) == 2
