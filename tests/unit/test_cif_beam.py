"""CIF beam search: beam=1 must reproduce greedy; wider beams score >=."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_asr.decode.cif_decode import cif_beam_decode, cif_greedy_decode
from tpu_asr.models import CifModel, ModelConfig

pytestmark = pytest.mark.slow


def _setup(rng):
    cfg = ModelConfig(vocab_size=14, d_input=8, d_model=32, d_inner=64,
                      num_heads=2, num_enc_layers=1, num_dec_layers=1,
                      dropout=0.0, model_type="cif")
    b, t = 2, 33
    feats = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    fl = jnp.asarray([t, t - 8])
    targets = jnp.asarray(rng.integers(2, 12, (b, 4)).astype(np.int32))
    tl = jnp.asarray([4, 4])
    model = CifModel(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    return model, params, feats, fl


def test_cif_beam1_equals_greedy(rng):
    model, params, feats, fl = _setup(rng)
    g_toks, g_lens = cif_greedy_decode(model, params, feats, fl, max_len=6)
    b_toks, b_lens = cif_beam_decode(model, params, feats, fl, beam=1,
                                     max_len=6)
    assert np.asarray(g_lens).tolist() == np.asarray(b_lens).tolist()
    np.testing.assert_array_equal(np.asarray(g_toks), np.asarray(b_toks))


def test_cif_beam_shapes(rng):
    model, params, feats, fl = _setup(rng)
    toks, lens = cif_beam_decode(model, params, feats, fl, beam=4,
                                 max_len=6)
    toks, lens = np.asarray(toks), np.asarray(lens)
    assert toks.shape == (2, 6)
    for i in range(2):
        assert (toks[i, lens[i]:] == -1).all()
