"""Solver epoch-loop mechanics on a tiny in-memory dataset: loss falls,
checkpoints + metrics written, early stop and half_lr trigger."""

import json
import os

import numpy as np
import jax
import pytest

from tpu_asr.data import Bucket, DataLoader
from tpu_asr.data.synthetic import make_synthetic_dataset
from tpu_asr.frontend import FrontendConfig
from tpu_asr.models import ModelConfig, Transformer
from tpu_asr.train import Solver, TrainState, make_optimizer
from tpu_asr.train.checkpoints import Checkpointer
from tpu_asr.train.metrics import MetricsWriter

pytestmark = pytest.mark.slow

CFG = ModelConfig(vocab_size=16, d_input=80, d_model=32, d_inner=64,
                  num_heads=2, num_enc_layers=1, num_dec_layers=1,
                  dropout=0.0, model_type="ctc")


def _loaders():
    utts, waves = make_synthetic_dataset(24, 16, min_tokens=2, max_tokens=5,
                                         tone_ms=60, seed=0)
    buckets = [Bucket(max_frames=8000, max_tokens=8, batch_size=8)]
    train = DataLoader(utts[4:], buckets, mode="wav", waves=waves, seed=1)
    cv = DataLoader(utts[:4], buckets, mode="wav", waves=waves,
                    shuffle=False)
    return train, cv


def _init_state(tx, cv):
    from tpu_asr.train.loop import batch_features, strip_host_fields
    import jax.numpy as jnp
    fcfg = FrontendConfig()
    model = Transformer(CFG)
    b0 = {k: jnp.asarray(v)
          for k, v in strip_host_fields(next(iter(cv))).items()}
    feats, flens = batch_features(b0, fcfg)
    variables = model.init(jax.random.PRNGKey(0), feats, flens,
                           b0["targets"], b0["target_lengths"])
    return model, TrainState.create(variables["params"], tx,
                                    jax.random.PRNGKey(1))


def test_solver_trains_and_checkpoints(tmp_path):
    train, cv = _loaders()
    tx = make_optimizer(CFG.d_model, warmup_steps=20, k=1.0)
    model, state = _init_state(tx, cv)
    ck = Checkpointer(str(tmp_path / "ckpt"))
    ck.save_config(CFG)
    mw = MetricsWriter(str(tmp_path / "metrics.jsonl"), echo=False)
    solver = Solver(model=model, tx=tx, train_loader=train, cv_loader=cv,
                    epochs=4, print_freq=1, frontend=FrontendConfig(),
                    checkpointer=ck, metrics_writer=mw)
    state = solver.train(state)
    ck.wait()
    assert int(state.step) > 0
    assert ck.latest_step() == int(state.step)
    records = [json.loads(l) for l in
               open(tmp_path / "metrics.jsonl", encoding="utf-8")]
    cv_recs = [r for r in records if r.get("phase") == "cv"]
    assert len(cv_recs) == 4
    assert cv_recs[-1]["loss"] < cv_recs[0]["loss"]
    # best.json exists (first epoch is always an improvement)
    assert os.path.exists(tmp_path / "ckpt" / "best.json")


def test_solver_half_lr_and_early_stop(tmp_path):
    train, cv = _loaders()
    # zero lr: cv loss is constant after epoch 0 -> guaranteed plateau,
    # exercising both the half_lr rebuild and early stopping
    factory = lambda scale: make_optimizer(CFG.d_model, warmup_steps=1,
                                           k=0.0 * scale)
    tx = factory(1.0)
    model, state = _init_state(tx, cv)
    mw = MetricsWriter(str(tmp_path / "m.jsonl"), echo=False)
    solver = Solver(model=model, tx=tx, train_loader=train, cv_loader=cv,
                    epochs=10, print_freq=100, frontend=FrontendConfig(),
                    metrics_writer=mw, half_lr=True, tx_factory=factory,
                    early_stop_patience=3)
    solver.train(state)
    records = [json.loads(l) for l in open(tmp_path / "m.jsonl",
                                           encoding="utf-8")]
    halved = [r for r in records if r.get("event") == "half_lr"]
    cv_recs = [r for r in records if r.get("phase") == "cv"]
    assert halved, "half_lr never triggered"
    assert len(cv_recs) < 10, "early stop never triggered"
