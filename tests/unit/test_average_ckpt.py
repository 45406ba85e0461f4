"""bin/average_checkpoints.py: params of the output checkpoint are the
elementwise mean of the selected steps, the sidecar survives, and
recognize-style restore (abstract TrainState) reads the result."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.models import ModelConfig, Transformer
from tpu_asr.train import TrainState, make_optimizer
from tpu_asr.train.checkpoints import Checkpointer

REPO = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))

CFG = ModelConfig(vocab_size=16, d_input=80, d_model=32, d_inner=64,
                  num_heads=2, num_enc_layers=1, num_dec_layers=1,
                  dropout=0.0, model_type="ctc")


def _make_state(seed):
    model = Transformer(CFG)
    feats = jnp.zeros((2, 50, 80), jnp.float32)
    flens = jnp.full((2,), 50, jnp.int32)
    ys = jnp.zeros((2, 4), jnp.int32)
    ylens = jnp.full((2,), 4, jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed), feats, flens, ys, ylens)
    tx = make_optimizer(CFG.d_model)
    return TrainState.create(variables["params"], tx, jax.random.PRNGKey(0))


@pytest.mark.slow
def test_average_checkpoints(tmp_path):
    src_dir = str(tmp_path / "src")
    ck = Checkpointer(src_dir)
    ck.save_config(CFG)
    states = []
    for i, seed in enumerate([1, 2, 3]):
        s = _make_state(seed).replace(step=jnp.asarray(i + 1))
        ck.save(s, epoch=i, cv_loss=1.0)
        states.append(s)
    ck.wait()

    out_dir = str(tmp_path / "avg")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin/average_checkpoints.py"),
         "--ckpt", src_dir, "--out", out_dir, "--last", "2",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr

    # restore the way recognize.py does: abstract TrainState target
    dst = Checkpointer(out_dir)
    assert dst.load_config().d_model == CFG.d_model
    restored, meta = dst.restore(_make_state(9), step=dst.best_step())
    assert meta["averaged_steps"] == [2, 3]

    expect = jax.tree.map(lambda a, b: (a.astype(jnp.float32)
                                        + b.astype(jnp.float32)) / 2,
                          states[1].params, states[2].params)
    got_flat = jax.tree.leaves(restored.params)
    exp_flat = jax.tree.leaves(expect)
    for g, e in zip(got_flat, exp_flat):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(e, np.float32), atol=1e-6)
