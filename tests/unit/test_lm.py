"""External-LM tests: TransformerLM module + shallow fusion in the beam.

The LM (models/lm.py) is a beyond-reference capability (espnet-family
shallow fusion). Pinned here:
- cached step() API == teacher-forced forward (the property fusion
  correctness rides on);
- config sidecar round-trip (recognize.py --lm-ckpt discovery);
- a few steps of training reduce loss (the bin/train_lm.py objective);
- fused beam scores decompose exactly into att + lm_weight * lm parts
  (ctc_weight=0), and attn_rescore's fused final score decomposes into
  its reported att/ctc parts + lm_weight * a teacher-forced LM score.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_asr.decode.beam import BeamConfig, attention_beam_search
from tpu_asr.models import ModelConfig, Transformer
from tpu_asr.models.decoder import Decoder
from tpu_asr.models.lm import (LMConfig, TransformerLM, load_lm_config,
                               save_lm_config)

VOCAB = 12
SOS, EOS = VOCAB - 2, VOCAB - 1
LM_CFG = LMConfig(vocab_size=VOCAB, d_model=32, d_inner=64, num_heads=2,
                  num_layers=2, dropout=0.0)
ASR_CFG = ModelConfig(vocab_size=VOCAB, d_input=8, d_model=32, d_inner=64,
                      num_heads=2, num_enc_layers=2, num_dec_layers=2,
                      dropout=0.0, model_type="hybrid")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _lm_with_params(seed=0):
    lm = TransformerLM(LM_CFG)
    ys = jnp.zeros((2, 4), jnp.int32)
    return lm, lm.init(jax.random.PRNGKey(seed), ys)


def test_lm_step_matches_teacher_forced(rng):
    lm, v = _lm_with_params()
    ys = jnp.asarray(rng.integers(0, VOCAB, (3, 6)).astype(np.int32))
    tf_logits = lm.apply(v, ys)
    cache = lm.apply(v, 3, 6, method=TransformerLM.init_cache)
    outs = []
    for pos in range(6):
        lg, cache = lm.apply(v, ys[:, pos], pos, cache,
                             method=TransformerLM.step)
        outs.append(lg)
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, 1)),
                               np.asarray(tf_logits), rtol=2e-5, atol=2e-5)


def test_lm_causality(rng):
    """Changing a future token must not change earlier logits."""
    lm, v = _lm_with_params()
    ys = jnp.asarray(rng.integers(0, VOCAB, (1, 6)).astype(np.int32))
    ys2 = ys.at[0, 4].set((ys[0, 4] + 1) % VOCAB)
    a = lm.apply(v, ys)
    b = lm.apply(v, ys2)
    np.testing.assert_allclose(np.asarray(a[:, :4]), np.asarray(b[:, :4]),
                               rtol=1e-6, atol=1e-6)
    assert not np.allclose(np.asarray(a[:, 4:]), np.asarray(b[:, 4:]))


def test_lm_config_sidecar_roundtrip(tmp_path):
    save_lm_config(str(tmp_path), LM_CFG)
    got = load_lm_config(str(tmp_path))
    assert got == LM_CFG


@pytest.mark.slow
def test_lm_trains_down(rng):
    """A few Adam steps on a tiny repetitive corpus reduce CE loss."""
    import optax
    from tpu_asr import IGNORE_ID
    from tpu_asr.ops.losses import label_smoothing_loss
    lm, v = _lm_with_params()
    params = v["params"]
    seq = [1, 2, 3, 1, 2, 3]
    ys_in = jnp.asarray([[SOS] + seq], jnp.int32)
    tgt = jnp.asarray([seq + [EOS]], jnp.int32)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p):
        logits = lm.apply({"params": p}, ys_in)
        return label_smoothing_loss(logits, tgt, 0.0, IGNORE_ID)[0]

    losses = []
    for _ in range(30):
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, upd)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def _setup_asr(rng, b=2, t=33):
    feats = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    fl = jnp.asarray([t, t - 8])
    targets = jnp.asarray(rng.integers(2, 10, (b, 4)).astype(np.int32))
    tl = jnp.asarray([4, 4])
    model = Transformer(ASR_CFG)
    params = model.init(jax.random.PRNGKey(1), feats, fl, targets, tl)
    enc_out, el = model.apply(params, feats, fl, method=Transformer.encode)
    return model, params, enc_out, el


def _lm_seq_score(lm, lm_v, tokens, length, include_eos=True):
    """Teacher-forced log P_lm(tokens[:length](, eos) | sos)."""
    ys = [SOS] + [int(t) for t in tokens[:length]]
    logits = lm.apply(lm_v, jnp.asarray([ys], jnp.int32))
    lp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), -1))[0]
    tgts = [int(t) for t in tokens[:length]]
    if include_eos:
        tgts.append(EOS)
    return sum(lp[i, t] for i, t in enumerate(tgts))


def _att_seq_score(dec, dp, enc_out, el, tokens, length, include_eos=True):
    """Teacher-forced attention log P(tokens[:length](, eos) | enc)."""
    ys = [SOS] + [int(t) for t in tokens[:length]]
    logits = dec.apply(dp, enc_out, el, jnp.asarray([ys], jnp.int32))
    lp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), -1))[0]
    tgts = [int(t) for t in tokens[:length]]
    if include_eos:
        tgts.append(EOS)
    return sum(lp[i, t] for i, t in enumerate(tgts))


@pytest.mark.parametrize("beam", [1, 3])
def test_fused_beam_scores_decompose(rng, beam):
    """ctc_weight=0, lm_weight=b: returned score must equal the
    teacher-forced attention score + b * teacher-forced LM score of the
    returned sequence (exact shallow-fusion accounting). Hypotheses
    still open at max_len are scored without the eos term (the search
    stops unscored there, reference maxlen semantics)."""
    model, params, enc_out, el = _setup_asr(rng)
    lm, lm_v = _lm_with_params(seed=3)
    dec = Decoder(ASR_CFG)
    dp = {"params": params["params"]["decoder"]}
    max_len, lw = 8, 0.4
    out = attention_beam_search(
        dec, dp, enc_out, el, SOS, EOS,
        BeamConfig(beam=beam, max_len=max_len, lm_weight=lw),
        lm=lm, lm_params=lm_v)
    for b in range(enc_out.shape[0]):
        for k in range(beam):
            L = int(out["lengths"][b, k])
            eos_scored = L < max_len
            toks = np.asarray(out["tokens"][b, k])
            att = _att_seq_score(dec, dp, enc_out[b:b + 1], el[b:b + 1],
                                 toks, L, include_eos=eos_scored)
            lm_s = _lm_seq_score(lm, lm_v, toks, L,
                                 include_eos=eos_scored)
            np.testing.assert_allclose(float(out["scores"][b, k]),
                                       att + lw * lm_s, rtol=1e-3,
                                       atol=1e-4)


def test_fused_joint_beam_runs_sorted(rng):
    model, params, enc_out, el = _setup_asr(rng)
    lm, lm_v = _lm_with_params(seed=3)
    dec = Decoder(ASR_CFG)
    dp = {"params": params["params"]["decoder"]}
    lg = model.apply(params, enc_out, method=Transformer.ctc_logits)
    ctc_logp = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
    out = attention_beam_search(
        dec, dp, enc_out, el, SOS, EOS,
        BeamConfig(beam=3, max_len=6, ctc_weight=0.3, lm_weight=0.4),
        ctc_logp=ctc_logp, lm=lm, lm_params=lm_v)
    s = np.asarray(out["scores"])
    assert np.isfinite(s).all()
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_attn_rescore_lm_decomposes(rng):
    """attn_rescore with an LM: final == att_scores + ctc_weight *
    ctc_scores + lm_weight * teacher-forced LM score of each hyp."""
    from tpu_asr.decode.rescore import NEG_INF, attention_rescore
    model, params, enc_out, el = _setup_asr(rng)
    lm, lm_v = _lm_with_params(seed=3)
    dec = Decoder(ASR_CFG)
    dp = {"params": params["params"]["decoder"]}
    ctc_logits = model.apply(params, enc_out, method=Transformer.ctc_logits)
    cw, lw = 0.5, 0.4
    out = attention_rescore(dec, dp, enc_out, el, ctc_logits, SOS, EOS,
                            beam=3, max_len=6, ctc_weight=cw,
                            lm=lm, lm_params=lm_v, lm_weight=lw)
    for b in range(enc_out.shape[0]):
        for k in range(3):
            if float(out["ctc_scores"][b, k]) <= NEG_INF / 2:
                continue  # dead n-best slot
            L = int(out["lengths"][b, k])
            lm_s = _lm_seq_score(lm, lm_v, np.asarray(out["tokens"][b, k]),
                                 L)
            want = (float(out["att_scores"][b, k])
                    + cw * float(out["ctc_scores"][b, k]) + lw * lm_s)
            np.testing.assert_allclose(float(out["scores"][b, k]), want,
                                       rtol=1e-3, atol=1e-4)


def test_lm_step_at_matches_step(rng):
    """Per-row-position step_at == scalar-position step when positions
    are uniform, and handles genuinely mixed positions (causality)."""
    lm, v = _lm_with_params()
    ys = jnp.asarray(rng.integers(0, VOCAB, (3, 6)).astype(np.int32))
    cache_a = lm.apply(v, 3, 6, method=TransformerLM.init_cache)
    cache_b = lm.apply(v, 3, 6, method=TransformerLM.init_cache)
    for pos in range(6):
        la, cache_a = lm.apply(v, ys[:, pos], pos, cache_a,
                               method=TransformerLM.step)
        lb, cache_b = lm.apply(v, ys[:, pos],
                               jnp.full((3,), pos, jnp.int32), cache_b,
                               method=TransformerLM.step_at)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-5)

    # mixed per-row positions: row r has consumed r+1 tokens; each row's
    # logits must equal the teacher-forced logits at its own position
    tf = np.asarray(lm.apply(v, ys))
    cache = lm.apply(v, 3, 6, method=TransformerLM.init_cache)
    # feed rows to different depths: row0 -> pos0, row1 -> pos0..1, row2 -> pos0..2
    for pos in range(3):
        active = jnp.asarray([r >= pos for r in range(3)])
        y_t = jnp.where(active, ys[:, pos], 0)
        p = jnp.where(active, pos, 0).astype(jnp.int32)
        lg, new_cache = lm.apply(v, y_t, p, cache,
                                 method=TransformerLM.step_at)
        cache = jax.tree.map(
            lambda nw, od: jnp.where(
                np.asarray(active).reshape((3,) + (1,) * (od.ndim - 1)),
                nw, od), new_cache, cache)
        for r in range(3):
            if r >= pos:
                np.testing.assert_allclose(np.asarray(lg)[r], tf[r, pos],
                                           rtol=2e-5, atol=2e-5)
