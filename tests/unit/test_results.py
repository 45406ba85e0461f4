"""Result formatting (espnet-compatible) + Recognizer nbest output."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_asr.utils.results import add_results_to_json, parse_hypothesis


def test_parse_hypothesis():
    chars = ["<blank>", "<unk>", "a", "b", "<sos>", "<eos>"]
    text, token, tokenid, score = parse_hypothesis(
        {"yseq": [2, 3, 2], "score": -1.5}, chars)
    assert text == "aba" and token == "a b a" and tokenid == "2 3 2"
    assert score == -1.5


def test_add_results_to_json():
    chars = ["<blank>", "<unk>", "a", "b", "<sos>", "<eos>"]
    js = {"input": [{"shape": [10, 80]}],
          "output": [{"name": "target1", "text": "ab", "tokenid": "2 3"}]}
    out = add_results_to_json(
        js, [{"yseq": [2, 3], "score": -0.1},
             {"yseq": [3], "score": -2.0}], chars)
    assert len(out["output"]) == 2
    assert out["output"][0]["rec_text"] == "ab"
    assert out["output"][0]["name"] == "target1[1]"
    assert out["output"][1]["rec_text"] == "b"
    # original reference text preserved on each entry
    assert out["output"][0]["text"] == "ab"
    # input untouched
    assert out["input"] == js["input"]


def test_recognizer_nbest(rng):
    from tpu_asr.decode.beam import BeamConfig
    from tpu_asr.decode.recognizer import Recognizer
    from tpu_asr.models import ModelConfig, Transformer
    cfg = ModelConfig(vocab_size=12, d_input=8, d_model=32, d_inner=64,
                      num_heads=2, num_enc_layers=1, num_dec_layers=1,
                      dropout=0.0, model_type="hybrid")
    feats = jnp.asarray(rng.standard_normal((2, 33, 8)).astype(np.float32))
    fl = jnp.asarray([33, 25])
    targets = jnp.asarray(rng.integers(2, 10, (2, 4)).astype(np.int32))
    tl = jnp.asarray([4, 4])
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    rec = Recognizer(cfg=cfg, params=params,
                     beam=BeamConfig(beam=3, max_len=6, nbest=3),
                     mode="beam")
    batch = {"feats": feats, "feat_lengths": fl}
    nb = rec.decode_batch_nbest(batch)
    assert len(nb) == 2 and all(len(x) == 3 for x in nb)
    for x in nb:
        scores = [h["score"] for h in x]
        assert scores == sorted(scores, reverse=True)
    one = rec.decode_batch(batch)
    assert one[0] == nb[0][0]["yseq"]
