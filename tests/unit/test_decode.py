"""Decode-layer tests.

- CTC prefix scorer vs brute-force path enumeration (prefix AND complete
  sequence probabilities), and vs the CTC loss for complete sequences.
- Beam search invariants: beam=1 == greedy rollout; returned scores match
  teacher-forced re-scoring of returned tokens for any width.
- CIF greedy decode: shapes, eos/fire-count truncation.
"""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_asr import IGNORE_ID
from tpu_asr.decode.beam import BeamConfig, attention_beam_search
from tpu_asr.decode.ctc_prefix import CTCPrefixScorer
from tpu_asr.decode.greedy_ctc import ctc_greedy_decode
from tpu_asr.models import ModelConfig, Transformer, add_sos_eos
from tpu_asr.models.decoder import Decoder

CFG = ModelConfig(vocab_size=12, d_input=8, d_model=32, d_inner=64,
                  num_heads=2, num_enc_layers=2, num_dec_layers=2,
                  dropout=0.0, model_type="hybrid")
SOS, EOS = CFG.vocab_size - 2, CFG.vocab_size - 1


def brute_force_probs(logp, prefix, blank=0):
    """(log P(collapse starts with prefix), log P(collapse == prefix))."""
    t, v = logp.shape
    p_prefix, p_exact = 0.0, 0.0
    prefix = tuple(prefix)
    for path in itertools.product(range(v), repeat=t):
        prob = float(np.exp(sum(logp[i, s] for i, s in enumerate(path))))
        collapsed = []
        prev = None
        for s in path:
            if s != blank and s != prev:
                collapsed.append(s)
            prev = s
        collapsed = tuple(collapsed)
        if collapsed[: len(prefix)] == prefix:
            p_prefix += prob
        if collapsed == prefix:
            p_exact += prob
    return np.log(max(p_prefix, 1e-300)), np.log(max(p_exact, 1e-300))


def walk_prefix(scorer, prefix, sos=SOS):
    """Advance the scorer along a prefix; returns (state, y_last)."""
    state = scorer.init_state()
    y_last = jnp.asarray([sos])
    for i, c in enumerate(prefix):
        cands = jnp.asarray([[c]])
        psi, new_r = scorer.score(cands, y_last, jnp.asarray([i == 0]), state)
        state = (new_r[:, 0], psi[:, 0])
        y_last = jnp.asarray([c])
    return state, y_last


@pytest.mark.parametrize("prefix", [(1,), (1, 2), (2, 2), (1, 2, 1)])
def test_ctc_prefix_scorer_vs_brute_force(prefix):
    rng = np.random.default_rng(0)
    t, v = 5, 4
    logits = rng.standard_normal((t, v)).astype(np.float64)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    scorer = CTCPrefixScorer(jnp.asarray(logp)[None].astype(jnp.float32),
                             jnp.asarray([t]), blank=0, eos=v - 1)
    # score the last symbol of the prefix as a candidate extension
    state, y_last = walk_prefix(scorer, prefix[:-1])
    cands = jnp.asarray([[prefix[-1], v - 1]])  # [candidate, eos]
    psi, _ = scorer.score(cands, y_last, jnp.asarray([len(prefix) == 1]),
                          state)
    want_prefix, _ = brute_force_probs(logp, prefix)
    np.testing.assert_allclose(float(psi[0, 0]), want_prefix, rtol=1e-4)
    # eos candidate after consuming the full prefix = exact match prob
    state_full, y_last_full = walk_prefix(scorer, prefix)
    psi2, _ = scorer.score(jnp.asarray([[v - 1]]), y_last_full,
                           jnp.asarray([False]), state_full)
    _, want_exact = brute_force_probs(logp, prefix)
    np.testing.assert_allclose(float(psi2[0, 0]), want_exact, rtol=1e-4)


def test_ctc_prefix_eos_matches_ctc_loss():
    """psi(eos | g) must equal -CTC_NLL(g) from the training loss."""
    from tpu_asr.ops.ctc import ctc_loss
    rng = np.random.default_rng(1)
    t, v = 11, 6
    labels = [2, 3, 3, 1]
    logits = rng.standard_normal((t, v)).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    scorer = CTCPrefixScorer(logp[None], jnp.asarray([t]), blank=0, eos=v - 1)
    state, y_last = walk_prefix(scorer, labels)
    psi, _ = scorer.score(jnp.asarray([[v - 1]]), y_last,
                          jnp.asarray([False]), state)
    nll = ctc_loss(logp[None], jnp.asarray([labels]), jnp.asarray([t]),
                   jnp.asarray([len(labels)]), reduction="none",
                   log_input=True)
    np.testing.assert_allclose(float(psi[0, 0]), -float(nll[0]), rtol=1e-4)


def _setup_model(rng, b=2, t=33):
    feats = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    fl = jnp.asarray([t, t - 8])
    targets = jnp.asarray(rng.integers(2, 10, (b, 4)).astype(np.int32))
    tl = jnp.asarray([4, 4])
    model = Transformer(CFG)
    params = model.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    enc_out, el = model.apply(params, feats, fl, method=Transformer.encode)
    return model, params, enc_out, el


def _greedy_rollout(dec, dp, enc_out, el, max_len):
    b = enc_out.shape[0]
    cache = dec.apply(dp, b, max_len, method=Decoder.init_cache)
    kv = dec.apply(dp, enc_out, method=Decoder.precompute_cross_kv)
    y = jnp.full((b,), SOS, jnp.int32)
    toks, logps = [], []
    finished = np.zeros(b, bool)
    for pos in range(max_len):
        logits, cache = dec.apply(dp, y, pos, cache, kv, el,
                                  method=Decoder.step)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        y = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        toks.append(np.asarray(y))
        logps.append(np.asarray(jnp.max(lp, axis=-1)))
    return np.stack(toks, 1), np.stack(logps, 1)


@pytest.mark.slow
def test_beam1_equals_greedy(rng):
    model, params, enc_out, el = _setup_model(rng)
    dec = Decoder(CFG)
    dp = {"params": params["params"]["decoder"]}
    out = attention_beam_search(dec, dp, enc_out, el, SOS, EOS,
                                BeamConfig(beam=1, max_len=8))
    greedy_toks, greedy_lps = _greedy_rollout(dec, dp, enc_out, el, 8)
    for b in range(enc_out.shape[0]):
        L = int(out["lengths"][b, 0])
        want = greedy_toks[b]
        got = np.asarray(out["tokens"][b, 0])
        # up to and including any eos, the sequences must agree
        for i in range(L):
            assert got[i] == want[i], (b, i, got, want)
        # score = sum of step logprobs up to & incl. the eos step (or maxlen)
        n_steps = L if L == 8 else L + 1
        np.testing.assert_allclose(float(out["scores"][b, 0]),
                                   greedy_lps[b, :n_steps].sum(), rtol=1e-4)


def _rescore(model, params, enc_out, el, tokens, length, max_len):
    """Teacher-forced sum of step log-probs for tokens + eos."""
    toks = np.full((1, max_len), IGNORE_ID, np.int32)
    toks[0, :length] = np.asarray(tokens[:length])
    ys_in, ys_out = add_sos_eos(jnp.asarray(toks), jnp.asarray([length]),
                                SOS, EOS)
    logits = model.apply(params, enc_out, el, ys_in,
                         method=Transformer.decode_logits)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    total = 0.0
    for i in range(length + 1):
        tgt = int(ys_out[0, i])
        if tgt == IGNORE_ID:
            break
        total += float(lp[0, i, tgt])
    return total


@pytest.mark.parametrize("beam", [2, 4])
def test_beam_scores_match_rescoring(rng, beam):
    model, params, enc_out, el = _setup_model(rng)
    dec = Decoder(CFG)
    dp = {"params": params["params"]["decoder"]}
    max_len = 8
    out = attention_beam_search(dec, dp, enc_out, el, SOS, EOS,
                                BeamConfig(beam=beam, max_len=max_len))
    for b in range(enc_out.shape[0]):
        for k in range(beam):
            L = int(out["lengths"][b, k])
            if L == max_len:
                continue  # no eos emitted; score excludes eos step
            want = _rescore(model, params, enc_out[b:b + 1], el[b:b + 1],
                            np.asarray(out["tokens"][b, k]), L, max_len)
            np.testing.assert_allclose(float(out["scores"][b, k]), want,
                                       rtol=1e-3, atol=1e-4)
    # beams sorted best-first
    s = np.asarray(out["scores"])
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_joint_ctc_beam_runs(rng):
    model, params, enc_out, el = _setup_model(rng)
    dec = Decoder(CFG)
    dp = {"params": params["params"]["decoder"]}
    ctc_logits = model.apply(params, enc_out, method=Transformer.ctc_logits)
    ctc_logp = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), axis=-1)
    out = attention_beam_search(
        dec, dp, enc_out, el, SOS, EOS,
        BeamConfig(beam=3, max_len=6, ctc_weight=0.3), ctc_logp=ctc_logp)
    assert out["tokens"].shape == (2, 3, 6)
    assert np.isfinite(np.asarray(out["scores"])).all()
    s = np.asarray(out["scores"])
    assert (np.diff(s, axis=1) <= 1e-6).all()


@pytest.mark.parametrize("ctc_weight", [0.0, 0.3])
def test_maxlen_minlen_ratio_per_utterance_stop(rng, ctc_weight):
    """maxlenratio/minlenratio (reference recognize_beam semantics): with
    minlenratio == maxlenratio, eos is banned before and forced at
    floor(ratio * enc_len), so each utterance stops at ITS OWN length —
    different encoder lengths give different stop positions."""
    model, params, enc_out, el = _setup_model(rng)
    dec = Decoder(CFG)
    dp = {"params": params["params"]["decoder"]}
    ctc_logp = None
    if ctc_weight > 0:
        lg = model.apply(params, enc_out, method=Transformer.ctc_logits)
        ctc_logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
    ratio = 0.6
    out = attention_beam_search(
        dec, dp, enc_out, el, SOS, EOS,
        BeamConfig(beam=2, max_len=8, ctc_weight=ctc_weight,
                   maxlenratio=ratio, minlenratio=ratio),
        ctc_logp=ctc_logp)
    want = np.floor(ratio * np.asarray(el)).astype(int)
    assert want[0] != want[1], "test needs distinct encoder lengths"
    got = np.asarray(out["lengths"])
    for i in range(enc_out.shape[0]):
        assert (got[i] == want[i]).all(), (i, got[i], want[i])
        # the forced eos is unscored and sits right after the last token
        toks = np.asarray(out["tokens"][i, 0])
        assert toks[want[i]] == EOS
        assert (toks[: want[i]] != EOS).all()


def test_ctc_greedy_decode_batched(rng):
    model, params, enc_out, el = _setup_model(rng)
    ctc_logits = model.apply(params, enc_out, method=Transformer.ctc_logits)
    toks, lens = ctc_greedy_decode(ctc_logits, el)
    assert toks.shape[0] == 2
    assert (np.asarray(lens) <= np.asarray(el)).all()


def test_cif_greedy_decode(rng):
    from tpu_asr.decode.cif_decode import cif_greedy_decode
    from tpu_asr.models import CifModel
    cfg = ModelConfig(**{**CFG.__dict__, "model_type": "cif"})
    b, t = 2, 33
    feats = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    fl = jnp.asarray([t, t - 8])
    targets = jnp.asarray(rng.integers(2, 10, (b, 4)).astype(np.int32))
    tl = jnp.asarray([4, 4])
    model = CifModel(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, fl, targets, tl)
    tokens, lengths = cif_greedy_decode(model, params, feats, fl, max_len=10)
    assert tokens.shape == (2, 10)
    lengths = np.asarray(lengths)
    assert (lengths <= 10).all()
    for i in range(b):
        assert (np.asarray(tokens)[i, lengths[i]:] == -1).all()


def test_attn_rescore_matches_host_rescoring(rng):
    """attn_rescore final scores == teacher-forced host rescoring of the
    CTC prefix-beam n-best + ctc_weight * CTC prefix score."""
    from tpu_asr.decode.ctc_beam import ctc_prefix_beam_search
    from tpu_asr.decode.rescore import attention_rescore

    model, params, enc_out, el = _setup_model(rng)
    dec = Decoder(CFG)
    dp = {"params": params["params"]["decoder"]}
    ctc_logits = model.apply(params, enc_out, method=Transformer.ctc_logits)
    w, lam = 3, 0.4
    max_len = 8
    out = attention_rescore(dec, dp, enc_out, el, ctc_logits, SOS, EOS,
                            beam=w, max_len=max_len, ctc_weight=lam)
    l_eff = min(max_len, ctc_logits.shape[1])
    toks, lens, ctc_scores = ctc_prefix_beam_search(
        ctc_logits, el, beam=w, max_len=l_eff)
    # independent expected score per n-best hypothesis
    expected = {}
    for b in range(enc_out.shape[0]):
        for k in range(w):
            sc = float(ctc_scores[b, k])
            if sc <= -1e29:
                continue
            L = int(lens[b, k])
            att = _rescore(model, params, enc_out[b:b + 1], el[b:b + 1],
                           np.asarray(toks[b, k]), L, l_eff)
            key = (b, tuple(int(t) for t in np.asarray(toks[b, k])[:L]))
            expected[key] = att + lam * sc
    checked = 0
    for b in range(enc_out.shape[0]):
        s = np.asarray(out["scores"][b])
        assert (np.diff(s) <= 1e-5).all()          # sorted best-first
        for k in range(w):
            if s[k] <= -1e29:
                continue
            L = int(out["lengths"][b, k])
            key = (b, tuple(int(t) for t in np.asarray(out["tokens"][b, k])[:L]))
            np.testing.assert_allclose(s[k], expected[key], rtol=1e-4,
                                       atol=1e-4)
            checked += 1
    assert checked >= enc_out.shape[0]             # at least 1-best each


@pytest.mark.slow
def test_mesh_decode_equals_single_device():
    """Data-parallel decode (Recognizer mesh=...) must return the SAME
    hypotheses and scores as single-device decode: decode is purely
    batch-parallel, so sharding the batch axis over the 'data' mesh axis
    is a layout change, not a numerical one."""
    from tpu_asr.decode.recognizer import Recognizer
    from tpu_asr.parallel import make_mesh

    rng = np.random.default_rng(7)
    feats = (rng.standard_normal((4, 64, 8)) * 2).astype(np.float32)
    flens = np.asarray([64, 50, 41, 33], np.int32)
    model = Transformer(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(flens), jnp.zeros((4, 4), jnp.int32),
                        jnp.full((4,), 4, jnp.int32))
    beam = BeamConfig(beam=3, max_len=10, nbest=3, ctc_weight=0.3)
    batch = {"feats": feats, "feat_lengths": flens, "ids": ["a", "b", "c", "d"]}

    ref = Recognizer(cfg=CFG, params=params, mode="joint",
                     beam=beam).decode_batch_nbest(batch)
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    got = Recognizer(cfg=CFG, params=params, mode="joint", beam=beam,
                     mesh=mesh).decode_batch_nbest(batch)

    assert len(got) == len(ref) == 4
    for r, g in zip(ref, got):
        for hr, hg in zip(r, g):
            assert hg["yseq"] == hr["yseq"]
            np.testing.assert_allclose(hg["score"], hr["score"],
                                       rtol=1e-5, atol=1e-5)


def test_greedy_ctc_emission_times():
    """return_times: each token's timestamp is the FIRST frame of its
    argmax run, matching a host reference collapse."""
    from tpu_asr.ops.ctc import ctc_greedy_collapse
    ids = jnp.asarray([[0, 3, 3, 0, 5, 0, 5, 5, 2],
                       [7, 7, 0, 0, 7, 1, 0, 0, 0]], jnp.int32)
    lengths = jnp.asarray([9, 6], jnp.int32)
    toks, n, times = ctc_greedy_collapse(ids, lengths, return_times=True)
    toks, n, times = (np.asarray(x) for x in (toks, n, times))

    def host(row, t_len):
        out, prev = [], -1
        for j in range(t_len):
            i = int(row[j])
            if i != 0 and i != prev:
                out.append((i, j))
            prev = i
        return out

    for b in range(2):
        want = host(np.asarray(ids)[b], int(lengths[b]))
        got = [(int(toks[b, j]), int(times[b, j])) for j in range(n[b])]
        assert got == want, (b, got, want)
        assert np.all(times[b, n[b]:] == -1)


@pytest.mark.parametrize("mode", ["joint", "greedy_ctc"])
def test_pipelined_decode_equals_per_batch(mode):
    """decode_batches_nbest (dispatch-ahead window + grouped output
    fetches, the bin/recognize.py production path) must return exactly
    the per-batch decode_batch_nbest results, in order, across mixed
    bucket shapes and a window smaller than the batch count."""
    from tpu_asr.decode.recognizer import Recognizer

    rng = np.random.default_rng(11)
    model = Transformer(CFG)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(rng.standard_normal((2, 32, 8)),
                                    jnp.float32),
                        jnp.asarray([32, 20], jnp.int32),
                        jnp.zeros((2, 4), jnp.int32),
                        jnp.full((2,), 4, jnp.int32))
    batches = []
    for i, t in enumerate((32, 48, 32, 48, 32)):   # two bucket shapes
        feats = (rng.standard_normal((2, t, 8)) * 2).astype(np.float32)
        flens = np.asarray([t, t - 7 - i], np.int32)
        batches.append({"feats": feats, "feat_lengths": flens,
                        "ids": [f"u{i}a", f"u{i}b"]})

    rec = Recognizer(cfg=CFG, params=params, mode=mode,
                     beam=BeamConfig(beam=3, max_len=8, nbest=2,
                                     ctc_weight=0.3))
    ref = [rec.decode_batch_nbest(b) for b in batches]
    got = rec.decode_batches_nbest(batches, window=2)

    assert len(got) == len(ref)
    for rb, gb in zip(ref, got):
        assert len(gb) == len(rb)
        for r, g in zip(rb, gb):
            for hr, hg in zip(r, g):
                assert hg["yseq"] == hr["yseq"]
                np.testing.assert_allclose(hg["score"], hr["score"],
                                           rtol=1e-6, atol=1e-6)
                assert hg.get("times") == hr.get("times")
                assert hg.get("confidence") == hr.get("confidence")
