"""Static-shape discipline: a bucketed epoch compiles one executable per
bucket — no recompilation storms (SURVEY.md section 4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_asr.data import Bucket, DataLoader
from tpu_asr.data.synthetic import make_synthetic_dataset
from tpu_asr.models import ModelConfig, Transformer
from tpu_asr.train import TrainState, make_optimizer, make_train_step
from tpu_asr.frontend import FrontendConfig

pytestmark = pytest.mark.slow

CFG = ModelConfig(vocab_size=16, d_input=80, d_model=16, d_inner=32,
                  num_heads=2, num_enc_layers=1, num_dec_layers=1,
                  dropout=0.0, model_type="ctc")


def test_one_executable_per_bucket():
    utts, waves = make_synthetic_dataset(24, 16, min_tokens=2, max_tokens=6,
                                         tone_ms=60, seed=0)
    buckets = [Bucket(max_frames=4800, max_tokens=8, batch_size=4),
               Bucket(max_frames=8000, max_tokens=8, batch_size=4)]
    loader = DataLoader(utts, buckets, mode="wav", waves=waves,
                        shuffle=False, drop_last=True)
    fcfg = FrontendConfig()
    tx = make_optimizer(CFG.d_model)
    model = Transformer(CFG)
    b0 = next(iter(loader))
    from tpu_asr.train.loop import batch_features, strip_host_fields
    arrays = {k: jnp.asarray(v) for k, v in strip_host_fields(b0).items()}
    feats, flens = batch_features(arrays, fcfg)
    variables = model.init(jax.random.PRNGKey(0), feats, flens,
                           arrays["targets"], arrays["target_lengths"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, frontend=fcfg, donate=False)

    seen_shapes = set()
    n = 0
    for epoch in range(2):
        for batch in loader:
            arrays = {k: jnp.asarray(v)
                      for k, v in strip_host_fields(batch).items()}
            seen_shapes.add(arrays["wav"].shape)
            state, m = step(state, arrays)
            n += 1
    assert n >= 6
    assert len(seen_shapes) <= len(buckets)
    # one compiled executable per bucket shape, across epochs
    assert step._cache_size() <= len(buckets), step._cache_size()
