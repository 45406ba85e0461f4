"""Export round-trip: flax params -> reference-named .pth.tar
(torch_export) -> torch_import -> the EXACT original flax tree, with the
config reconstructed from the blob alone. Covers hybrid (conv2d) and
attention-only (LFR/linear, untied) layouts."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.models import ModelConfig, Transformer
from tpu_asr.parity.torch_export import export_torch_checkpoint
from tpu_asr.parity.torch_import import load_torch_checkpoint


def _init(cfg, t=40):
    model = Transformer(cfg)
    feats = jnp.zeros((1, t, cfg.encoder_input_dim if cfg.input_layer ==
                       "linear" else cfg.d_input), jnp.float32)
    return model.init(jax.random.PRNGKey(0), feats,
                      jnp.full((1,), t, jnp.int32),
                      jnp.zeros((1, 4), jnp.int32),
                      jnp.full((1,), 4, jnp.int32))


@pytest.mark.parametrize("case", ["hybrid_conv", "attention_linear", "ctc"])
def test_export_import_roundtrip(tmp_path, case):
    if case == "hybrid_conv":
        cfg = ModelConfig(vocab_size=18, d_model=32, d_inner=64,
                          num_heads=2, num_enc_layers=2, num_dec_layers=2,
                          conv_channels=4, dropout=0.0, model_type="hybrid")
    elif case == "attention_linear":
        cfg = ModelConfig(vocab_size=18, d_model=32, d_inner=64,
                          num_heads=2, num_enc_layers=1, num_dec_layers=2,
                          dropout=0.0, model_type="transformer",
                          input_layer="linear", lfr_m=4, lfr_n=3,
                          tie_embedding=False)
    else:
        cfg = ModelConfig(vocab_size=18, d_model=32, d_inner=64,
                          num_heads=2, num_enc_layers=2, num_dec_layers=0,
                          conv_channels=4, dropout=0.0, model_type="ctc")
    params = _init(cfg)
    path = str(tmp_path / "final.pth.tar")
    export_torch_checkpoint(path, params, cfg, epoch=7, cv_loss=1.25)

    back, back_cfg = load_torch_checkpoint(path)   # cfg from the blob
    assert back_cfg.model_type == cfg.model_type
    assert back_cfg.vocab_size == cfg.vocab_size
    assert back_cfg.num_enc_layers == cfg.num_enc_layers
    assert back_cfg.num_dec_layers == cfg.num_dec_layers
    assert back_cfg.tie_embedding == cfg.tie_embedding

    want = dict(jax.tree.leaves_with_path(params["params"]))
    got = dict(jax.tree.leaves_with_path(back["params"]))
    assert set(want) == set(got), (set(want) ^ set(got))
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=str(k))
