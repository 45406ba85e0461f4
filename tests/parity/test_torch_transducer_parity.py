"""Full-model transducer loss parity: identical weights + batch give the
same loss_rnnt / loss_ctc / total in the flax model and the torch twin
(whose lattice DP is the textbook per-utterance python loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tpu_asr.models import ModelConfig, TransducerModel
from tpu_asr.parity.torch_twin_transducer import (
    TorchTransducerModel, import_flax_transducer_params)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_batch(rng, b=3, t=45, u=6, vocab=20):
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    flens = np.array([t, t - 8, t - 16][:b], np.int32)
    targets = rng.integers(1, vocab - 2, (b, u)).astype(np.int32)
    tlens = np.array([u, u - 2, u - 3][:b], np.int32)
    targets[np.arange(u)[None, :] >= tlens[:, None]] = -1
    return feats, flens, targets, tlens


@pytest.mark.parametrize("ctc_weight", [0.0, 0.3])
def test_transducer_losses_match_torch_twin(rng, ctc_weight):
    cfg = ModelConfig(vocab_size=20, d_model=32, d_inner=64, num_heads=2,
                      num_enc_layers=2, num_pred_layers=2, d_joint=24,
                      conv_channels=8, dropout=0.0,
                      model_type="transducer", ctc_weight=ctc_weight)
    feats, flens, targets, tlens = make_batch(rng)
    model = TransducerModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(flens), jnp.asarray(targets),
                        jnp.asarray(tlens))
    out = model.apply(params, jnp.asarray(feats), jnp.asarray(flens),
                      jnp.asarray(targets), jnp.asarray(tlens))

    twin = TorchTransducerModel(cfg)
    import_flax_transducer_params(twin, params)
    twin.eval()
    with torch.no_grad():
        tout = twin.loss(torch.tensor(feats), torch.tensor(flens),
                         torch.tensor(targets.astype(np.int64)),
                         torch.tensor(tlens))

    assert float(out["loss_rnnt"]) == pytest.approx(
        float(tout["loss_rnnt"]), rel=2e-4)
    if ctc_weight > 0:
        assert float(out["loss_ctc"]) == pytest.approx(
            float(tout["loss_ctc"]), rel=2e-4)
    assert float(out["loss"]) == pytest.approx(
        float(tout["loss"]), rel=2e-4)
