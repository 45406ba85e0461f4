"""CTC prefix beam search vs a brute-force host oracle (full-vocab
expansion, dict-based exact prefix merging) and a peaked-logits
greedy-equivalence sanity check."""

import math
from collections import defaultdict

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.decode.ctc_beam import ctc_prefix_beam_search
from tpu_asr.decode.greedy_ctc import ctc_greedy_decode

NEG_INF = -1e30


def _lae(a, b):
    if a <= NEG_INF / 2:
        return b
    if b <= NEG_INF / 2:
        return a
    m = max(a, b)
    return m + math.log1p(math.exp(min(a, b) - m))


def oracle_prefix_beam(logp, beam, blank=0):
    """logp [T, V] log-softmaxed numpy; returns [(prefix, score)] best-first."""
    t_len, v = logp.shape
    beams = {(): (0.0, NEG_INF)}                   # prefix -> (pb, pnb)
    for t in range(t_len):
        new = defaultdict(lambda: [NEG_INF, NEG_INF])
        for prefix, (pb, pnb) in beams.items():
            total = _lae(pb, pnb)
            ent = new[prefix]
            ent[0] = _lae(ent[0], total + logp[t, blank])   # blank
            if prefix:
                ent[1] = _lae(ent[1], pnb + logp[t, prefix[-1]])  # repeat
            for c in range(v):
                if c == blank:
                    continue
                base = pb if (prefix and c == prefix[-1]) else total
                ext = new[prefix + (c,)]
                ext[1] = _lae(ext[1], base + logp[t, c])
        ranked = sorted(new.items(), key=lambda kv: -_lae(*kv[1]))[:beam]
        beams = {k: tuple(val) for k, val in ranked}
    return [(list(p), _lae(*s)) for p, s in
            sorted(beams.items(), key=lambda kv: -_lae(*kv[1]))]


@pytest.mark.parametrize("beam", [1, 4])
def test_matches_oracle(beam):
    rng = np.random.default_rng(0)
    v, t = 8, 18
    lens = np.asarray([18, 11], np.int32)
    logits = rng.standard_normal((2, t, v)).astype(np.float32) * 2
    toks, tlens, scores = ctc_prefix_beam_search(
        jnp.asarray(logits), jnp.asarray(lens), beam=beam, topk=v - 1,
        max_len=t)
    for i in range(2):
        lp = np.asarray(
            jnp.log(jnp.asarray(np.exp(logits[i]) /
                                np.exp(logits[i]).sum(-1, keepdims=True))))
        ref = oracle_prefix_beam(lp[: lens[i]], beam)
        got = [int(x) for x in np.asarray(toks[i, 0])[: int(tlens[i, 0])]]
        assert got == ref[0][0], (i, got, ref[0])
        np.testing.assert_allclose(float(scores[i, 0]), ref[0][1],
                                   rtol=1e-4, atol=1e-4)


def test_topk_pruning_still_finds_best():
    """With a modest top-K (not full vocab) the 1-best survives on
    realistic (non-adversarial) peaked distributions."""
    rng = np.random.default_rng(3)
    v, t = 30, 25
    logits = rng.standard_normal((1, t, v)).astype(np.float32)
    logits[0, np.arange(t), rng.integers(0, v, t)] += 4.0   # peaked frames
    full_t, full_l, full_s = ctc_prefix_beam_search(
        jnp.asarray(logits), jnp.asarray([t], np.int32), beam=4,
        topk=v - 1, max_len=t)
    prun_t, prun_l, prun_s = ctc_prefix_beam_search(
        jnp.asarray(logits), jnp.asarray([t], np.int32), beam=4,
        topk=8, max_len=t)
    a = [int(x) for x in np.asarray(full_t[0, 0])[: int(full_l[0, 0])]]
    b = [int(x) for x in np.asarray(prun_t[0, 0])[: int(prun_l[0, 0])]]
    assert a == b
    np.testing.assert_allclose(float(full_s[0, 0]), float(prun_s[0, 0]),
                               rtol=1e-3)


def test_peaked_logits_equal_greedy():
    """Near-deterministic posteriors: prefix beam 1-best == greedy
    collapse."""
    rng = np.random.default_rng(7)
    v, t = 10, 30
    path = rng.integers(0, v, t)
    logits = np.full((1, t, v), -5.0, np.float32)
    logits[0, np.arange(t), path] = 5.0
    lens = np.asarray([t], np.int32)
    toks, tlens, _ = ctc_prefix_beam_search(
        jnp.asarray(logits), jnp.asarray(lens), beam=4, topk=5, max_len=t)
    g_toks, g_lens = ctc_greedy_decode(jnp.asarray(logits),
                                       jnp.asarray(lens))
    beam1 = [int(x) for x in np.asarray(toks[0, 0])[: int(tlens[0, 0])]]
    greedy = [int(x) for x in np.asarray(g_toks[0])[: int(g_lens[0])]]
    assert beam1 == greedy


def _lm_next_fn(lm, lm_params, sos):
    """Host oracle LM: prefix tuple -> next-token log-prob vector, via the
    teacher-forced TransformerLM __call__ (memoized)."""
    import jax
    memo = {}

    def f(prefix):
        if prefix not in memo:
            ys = jnp.asarray([[sos] + list(prefix)], jnp.int32)
            lp = jax.nn.log_softmax(
                lm.apply(lm_params, ys).astype(jnp.float32), axis=-1)
            memo[prefix] = np.asarray(lp[0, -1])
        return memo[prefix]

    return f


def oracle_fused_beam(logp, beam, lm_next, lm_weight, blank=0):
    """Shallow-fusion host oracle: the acoustic pb/pnb recursion of
    oracle_prefix_beam, but per-frame pruning AND final ranking use
    score = logP_ctc(prefix) + lm_weight * logP_lm(prefix)."""
    t_len, v = logp.shape
    lmsc = {(): 0.0}

    def lm_score(p):
        if p not in lmsc:
            lmsc[p] = (lm_score(p[:-1])
                       + lm_weight * float(lm_next(p[:-1])[p[-1]]))
        return lmsc[p]

    beams = {(): (0.0, NEG_INF)}
    for t in range(t_len):
        new = defaultdict(lambda: [NEG_INF, NEG_INF])
        for prefix, (pb, pnb) in beams.items():
            total = _lae(pb, pnb)
            ent = new[prefix]
            ent[0] = _lae(ent[0], total + logp[t, blank])
            if prefix:
                ent[1] = _lae(ent[1], pnb + logp[t, prefix[-1]])
            for c in range(v):
                if c == blank:
                    continue
                base = pb if (prefix and c == prefix[-1]) else total
                ext = new[prefix + (c,)]
                ext[1] = _lae(ext[1], base + logp[t, c])
        ranked = sorted(
            new.items(),
            key=lambda kv: -(_lae(*kv[1]) + lm_score(kv[0])))[:beam]
        beams = {k: tuple(val) for k, val in ranked}
    return [(list(p), _lae(*s) + lm_score(p)) for p, s in
            sorted(beams.items(),
                   key=lambda kv: -(_lae(*kv[1]) + lm_score(kv[0])))]


@pytest.mark.slow
def test_lm_fusion_matches_host_oracle():
    """Fused CTC prefix beam (compiled lax.scan with in-carry LM caches)
    == the host fusion oracle: same 1-best prefixes and fused scores,
    and the LM actually changes the ranking vs the acoustic-only search
    on at least one utterance."""
    import jax
    from tpu_asr.models.lm import LMConfig, TransformerLM

    v, t, beam = 8, 14, 4
    sos = v - 2
    lm_cfg = LMConfig(vocab_size=v, d_model=16, d_inner=32, num_heads=2,
                      num_layers=1, dropout=0.0)
    lm = TransformerLM(lm_cfg)
    lm_params = lm.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 4), jnp.int32))
    rng = np.random.default_rng(11)
    lens = np.asarray([14, 9, 12], np.int32)
    logits = rng.standard_normal((3, t, v)).astype(np.float32) * 1.5
    lm_w = 0.7

    toks, tlens, scores = ctc_prefix_beam_search(
        jnp.asarray(logits), jnp.asarray(lens), beam=beam, topk=v - 1,
        max_len=t, lm=lm, lm_params=lm_params, lm_weight=lm_w, sos=sos)
    pl_toks, pl_lens, _ = ctc_prefix_beam_search(
        jnp.asarray(logits), jnp.asarray(lens), beam=beam, topk=v - 1,
        max_len=t)

    lm_next = _lm_next_fn(lm, lm_params, sos)
    changed = False
    for i in range(3):
        e = np.exp(logits[i])
        lp = np.log(e / e.sum(-1, keepdims=True))
        ref = oracle_fused_beam(lp[: lens[i]], beam, lm_next, lm_w)
        got = [int(x) for x in np.asarray(toks[i, 0])[: int(tlens[i, 0])]]
        assert got == ref[0][0], (i, got, ref[0])
        np.testing.assert_allclose(float(scores[i, 0]), ref[0][1],
                                   rtol=1e-4, atol=1e-4)
        plain = [int(x)
                 for x in np.asarray(pl_toks[i, 0])[: int(pl_lens[i, 0])]]
        changed = changed or plain != got
    assert changed, "LM weight 0.7 should alter at least one 1-best"


@pytest.mark.slow
def test_lm_fusion_streaming_equals_offline():
    """StreamingCTCBeamRecognizer with shallow fusion: the fused beam
    state (LM scores, next-token log-probs, K/V caches) rides the
    cross-push carry, so chunked streaming == offline fused search."""
    import jax
    from tpu_asr.decode.streaming import StreamingCTCBeamRecognizer
    from tpu_asr.models import ModelConfig, Transformer
    from tpu_asr.models.lm import LMConfig, TransformerLM

    cfg = ModelConfig(vocab_size=12, d_input=80, d_model=32, d_inner=64,
                      num_heads=2, num_enc_layers=2, num_dec_layers=1,
                      dropout=0.0, model_type="ctc", enc_chunk_size=4)
    model = Transformer(cfg)
    lm_cfg = LMConfig(vocab_size=12, d_model=16, d_inner=32, num_heads=2,
                      num_layers=1, dropout=0.0)
    lm = TransformerLM(lm_cfg)
    lm_params = lm.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 4), jnp.int32))
    rng = np.random.default_rng(13)
    t = 131
    feats = (rng.standard_normal((t, 80)) * 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 80, 80), jnp.float32),
                        jnp.full((1,), 80, jnp.int32),
                        jnp.zeros((1, 4), jnp.int32),
                        jnp.full((1,), 4, jnp.int32))

    enc, el = model.apply(params, jnp.asarray(feats[None]),
                          jnp.asarray([t], jnp.int32),
                          method=Transformer.encode)
    logits = model.apply(params, enc, method=Transformer.ctc_logits)
    toks, lens, _ = ctc_prefix_beam_search(
        logits, el, beam=4, topk=8, max_len=48,
        lm=lm, lm_params=lm_params, lm_weight=0.5,
        sos=cfg.vocab_size - 2)
    ref = [int(x) for x in np.asarray(toks[0, 0])[: int(lens[0, 0])]]

    for sizes in ((t,), (23,) * 6):
        rec = StreamingCTCBeamRecognizer(
            cfg, params, beam=4, topk=8, max_frames=192, max_tokens=48,
            lm_cfg=lm_cfg, lm_params=lm_params, lm_weight=0.5)
        pos = 0
        for sz in sizes:
            take = min(sz, t - pos)
            if not take:
                break
            rec.push(feats[pos:pos + take])
            pos += take
        assert rec.finish() == ref, sizes


def test_recognizer_ctc_beam_mode():
    """mode="ctc_beam" plumbs through the Recognizer (nbest format,
    pad/eos cleaning) and matches the direct search 1-best."""
    import jax
    from tpu_asr.decode.recognizer import Recognizer
    from tpu_asr.models import ModelConfig, Transformer

    cfg = ModelConfig(vocab_size=12, d_input=80, d_model=32, d_inner=64,
                      num_heads=2, num_enc_layers=1, num_dec_layers=1,
                      dropout=0.0, model_type="ctc")
    model = Transformer(cfg)
    rng = np.random.default_rng(5)
    feats = (rng.standard_normal((2, 120, 80)) * 3).astype(np.float32)
    flens = np.asarray([120, 90], np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(flens), jnp.zeros((2, 4), jnp.int32),
                        jnp.full((2,), 4, jnp.int32))
    from tpu_asr.decode.beam import BeamConfig
    rec = Recognizer(cfg=cfg, params=params, mode="ctc_beam",
                     beam=BeamConfig(beam=4, max_len=40, nbest=2))
    nbest = rec.decode_batch_nbest({"feats": feats, "feat_lengths": flens})
    assert len(nbest) == 2 and len(nbest[0]) == 2
    assert nbest[0][0]["score"] >= nbest[0][1]["score"]

    enc, el = model.apply(params, jnp.asarray(feats), jnp.asarray(flens),
                          method=Transformer.encode)
    logits = model.apply(params, enc, method=Transformer.ctc_logits)
    toks, lens, _ = ctc_prefix_beam_search(logits, el, beam=4, max_len=40)
    for i in range(2):
        direct = [int(x) for x in np.asarray(toks[i, 0])[: int(lens[i, 0])]]
        assert nbest[i][0]["yseq"] == direct


def test_streaming_beam_equals_offline():
    """StreamingCTCBeamRecognizer (chunked KV-cached encoder + carried
    beam state) == offline ctc_prefix_beam_search over the full
    utterance's encoder output — exact, for any feed segmentation."""
    import jax
    from tpu_asr.decode.streaming import StreamingCTCBeamRecognizer
    from tpu_asr.models import ModelConfig, Transformer

    cfg = ModelConfig(vocab_size=12, d_input=80, d_model=32, d_inner=64,
                      num_heads=2, num_enc_layers=2, num_dec_layers=1,
                      dropout=0.0, model_type="ctc", enc_chunk_size=4)
    model = Transformer(cfg)
    rng = np.random.default_rng(9)
    t = 173
    feats = (rng.standard_normal((t, 80)) * 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 80, 80), jnp.float32),
                        jnp.full((1,), 80, jnp.int32),
                        jnp.zeros((1, 4), jnp.int32),
                        jnp.full((1,), 4, jnp.int32))

    enc, el = model.apply(params, jnp.asarray(feats[None]),
                          jnp.asarray([t], jnp.int32),
                          method=Transformer.encode)
    logits = model.apply(params, enc, method=Transformer.ctc_logits)
    toks, lens, scores = ctc_prefix_beam_search(logits, el, beam=4,
                                                topk=8, max_len=64)
    ref = [int(x) for x in np.asarray(toks[0, 0])[: int(lens[0, 0])]]

    for sizes in ((t,), (19,) * 10):
        rec = StreamingCTCBeamRecognizer(cfg, params, beam=4, topk=8,
                                         max_frames=256, max_tokens=64)
        pos = 0
        mid = []
        for sz in sizes:
            take = min(sz, t - pos)
            if not take:
                break
            mid = rec.push(feats[pos:pos + take])
            pos += take
        assert rec.finish() == ref, sizes
    assert isinstance(mid, list)
