"""TransducerModel tests: train-objective sanity, batched greedy decode ==
per-utterance host loop (bit-identical hypotheses), padding invariance,
and Recognizer wiring. Covers tpu_asr/models/transducer.py and
tpu_asr/decode/transducer_decode.py."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.decode.transducer_decode import transducer_greedy_decode
from tpu_asr.models import ModelConfig, TransducerModel, build_model


def tiny_cfg(**kw):
    base = dict(vocab_size=12, d_model=16, d_inner=32, num_heads=2,
                num_enc_layers=1, num_pred_layers=1, d_joint=16,
                conv_channels=4, dropout=0.0, model_type="transducer",
                ctc_weight=0.0)
    base.update(kw)
    return ModelConfig(**base)


def make_batch(rng, b=3, t=64, u=5, vocab=12):
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    flens = np.array([t, t - 10, t - 20][:b], np.int32)
    targets = rng.integers(1, vocab - 2, (b, u)).astype(np.int32)
    tlens = np.array([u, u - 1, u - 2][:b], np.int32)
    targets[np.arange(u)[None, :] >= tlens[:, None]] = -1
    return feats, flens, targets, tlens


def init_model(cfg, batch):
    model = TransducerModel(cfg)
    feats, flens, targets, tlens = batch
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(flens), jnp.asarray(targets),
                        jnp.asarray(tlens))
    return model, params


@pytest.mark.slow
def test_forward_losses_and_grads_finite():
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    cfg = tiny_cfg(ctc_weight=0.3)
    model, params = init_model(cfg, batch)
    feats, flens, targets, tlens = (jnp.asarray(x) for x in batch)

    def loss_fn(p):
        out = model.apply(p, feats, flens, targets, tlens)
        return out["loss"], out

    grads, out = jax.grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["loss_rnnt"]))
    assert np.isfinite(float(out["loss_ctc"]))
    assert float(out["loss"]) > 0
    gn = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                            for g in jax.tree.leaves(grads))))
    assert np.isfinite(gn) and gn > 0


def test_dummy_rows_do_not_change_loss():
    rng = np.random.default_rng(1)
    feats, flens, targets, tlens = make_batch(rng)
    cfg = tiny_cfg()
    model, params = init_model(cfg, (feats, flens, targets, tlens))
    base = model.apply(params, jnp.asarray(feats), jnp.asarray(flens),
                       jnp.asarray(targets), jnp.asarray(tlens))
    # append a dummy row (feat_lengths == 0, loader convention)
    f2 = np.concatenate([feats, feats[:1]], 0)
    fl2 = np.concatenate([flens, [0]]).astype(np.int32)
    tg2 = np.concatenate([targets, targets[:1]], 0)
    tl2 = np.concatenate([tlens, [0]]).astype(np.int32)
    padded = model.apply(params, jnp.asarray(f2), jnp.asarray(fl2),
                         jnp.asarray(tg2), jnp.asarray(tl2))
    # masked_row_mean averages over valid rows only
    np.testing.assert_allclose(float(padded["loss_rnnt"]),
                               float(base["loss_rnnt"]), rtol=1e-5)


def host_greedy(model, params, feats, flens, max_tokens=16, cap=4):
    """Per-utterance host-driven greedy loop (the reference-style decode
    the compiled while_loop must reproduce exactly)."""
    sos = model.cfg.vocab_size - 2
    out = []
    for i in range(feats.shape[0]):
        enc, el = model.apply(params, jnp.asarray(feats[i: i + 1]),
                              jnp.asarray(flens[i: i + 1]), method="encode")
        f = model.apply(params, enc, method="enc_features")[0]
        cache = model.apply(params, 1, max_tokens + 1,
                            method="predictor_init_cache")
        g, cache = model.apply(params, jnp.array([sos], jnp.int32),
                               jnp.array([0], jnp.int32), cache,
                               method="predictor_step")
        t, emitted, toks = 0, 0, []
        while t < int(el[0]):
            logits = model.apply(params, f[t: t + 1], g,
                                 method="joint_step")
            k = int(jnp.argmax(logits[0]))
            if k != 0 and len(toks) < max_tokens and emitted < cap:
                toks.append(k)
                emitted += 1
                g, cache = model.apply(
                    params, jnp.array([k], jnp.int32),
                    jnp.array([len(toks)], jnp.int32), cache,
                    method="predictor_step")
            else:
                t += 1
                emitted = 0
        out.append(toks)
    return out


def test_batched_greedy_equals_host_loop():
    rng = np.random.default_rng(2)
    batch = make_batch(rng)
    cfg = tiny_cfg()
    model, params = init_model(cfg, batch)
    feats, flens = batch[0], batch[1]
    toks, lens = jax.jit(
        lambda p, f, fl: transducer_greedy_decode(
            model, p, f, fl, max_tokens=16))(
        params, jnp.asarray(feats), jnp.asarray(flens))
    toks, lens = np.asarray(toks), np.asarray(lens)
    want = host_greedy(model, params, feats, flens)
    for i in range(feats.shape[0]):
        got = [int(x) for x in toks[i, : lens[i]]]
        assert got == want[i], (i, got, want[i])


def test_greedy_padding_invariance():
    """Extra pad frames and batch composition don't change hypotheses."""
    rng = np.random.default_rng(3)
    batch = make_batch(rng)
    cfg = tiny_cfg()
    model, params = init_model(cfg, batch)
    feats, flens = batch[0], batch[1]
    toks, lens = transducer_greedy_decode(
        model, params, jnp.asarray(feats), jnp.asarray(flens),
        max_tokens=16)
    f2 = np.concatenate(
        [feats, rng.standard_normal((3, 16, 80)).astype("f4")], axis=1)
    toks2, lens2 = transducer_greedy_decode(
        model, params, jnp.asarray(f2), jnp.asarray(flens), max_tokens=16)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens2))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))


def test_recognizer_wiring():
    from tpu_asr.decode.beam import BeamConfig
    from tpu_asr.decode.recognizer import Recognizer
    rng = np.random.default_rng(4)
    batch = make_batch(rng)
    cfg = tiny_cfg(ctc_weight=0.3)
    model, params = init_model(cfg, batch)
    rec = Recognizer(cfg=cfg, params=params, mode="transducer_greedy",
                     beam=BeamConfig(beam=1, max_len=16))
    hyps = rec.decode_batch_nbest(
        {"feats": batch[0], "feat_lengths": batch[1]})
    assert len(hyps) == 3
    assert all(isinstance(h[0]["yseq"], list) for h in hyps)
    # aux CTC head serves the frame-synchronous CTC modes too
    rec2 = Recognizer(cfg=cfg, params=params, mode="greedy_ctc",
                      beam=BeamConfig(beam=1, max_len=16))
    hyps2 = rec2.decode_batch_nbest(
        {"feats": batch[0], "feat_lengths": batch[1]})
    assert len(hyps2) == 3


def test_build_model_dispatch():
    assert type(build_model(tiny_cfg())).__name__ == "TransducerModel"
    assert type(build_model(
        dataclasses.replace(tiny_cfg(), model_type="hybrid",
                            num_dec_layers=1))).__name__ == "Transformer"


def test_streaming_equals_offline_transducer():
    """Chunked-encoder streaming greedy == offline greedy, exact tokens,
    across ragged pushes; push is append-only."""
    from tpu_asr.decode.streaming import StreamingTransducerRecognizer
    rng = np.random.default_rng(5)
    cfg = tiny_cfg(enc_chunk_size=4)
    batch = make_batch(rng)
    model, params = init_model(cfg, batch)
    t = 137
    feats = (rng.standard_normal((t, 80)) * 3).astype(np.float32)

    ref_toks, ref_lens = transducer_greedy_decode(
        model, params, jnp.asarray(feats[None]),
        jnp.asarray([t], np.int32), max_tokens=32)
    ref = [int(x) for x in np.asarray(ref_toks)[0, : int(ref_lens[0])]]

    rec = StreamingTransducerRecognizer(cfg, params, max_frames=256,
                                        max_tokens=32)
    streamed, pos = [], 0
    for sz in (9, 33, 4, 70, 2, 50):
        take = min(sz, t - pos)
        if take == 0:
            break
        new = rec.push(feats[pos: pos + take])
        streamed.extend(new)
        assert streamed == rec.hypothesis      # append-only
        pos += take
    hyp = rec.finish()
    assert hyp[: len(streamed)] == streamed
    assert hyp == ref


def test_beam1_equals_greedy():
    """ALSD beam with W=1 reproduces greedy (when the greedy per-frame
    emission cap is not binding)."""
    from tpu_asr.decode.transducer_decode import transducer_beam_search
    rng = np.random.default_rng(6)
    cfg = tiny_cfg()
    batch = make_batch(rng)
    model, params = init_model(cfg, batch)
    feats, flens = batch[0], batch[1]
    gt, gl = transducer_greedy_decode(
        model, params, jnp.asarray(feats), jnp.asarray(flens),
        max_tokens=16, max_symbols_per_frame=16)
    out = transducer_beam_search(model, params, jnp.asarray(feats),
                                 jnp.asarray(flens), beam=1, max_tokens=16)
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(out["lengths"])[:, 0])
    for i in range(feats.shape[0]):
        li = int(gl[i])
        np.testing.assert_array_equal(np.asarray(gt)[i, :li],
                                      np.asarray(out["tokens"])[i, 0, :li])


def test_beam_search_wellformed_and_deterministic():
    from tpu_asr.decode.transducer_decode import transducer_beam_search
    rng = np.random.default_rng(7)
    cfg = tiny_cfg()
    batch = make_batch(rng)
    model, params = init_model(cfg, batch)
    feats, flens = jnp.asarray(batch[0]), jnp.asarray(batch[1])
    out = transducer_beam_search(model, params, feats, flens, beam=4,
                                 max_tokens=16)
    scores = np.asarray(out["scores"])
    assert np.all(np.isfinite(scores))
    assert np.all(np.diff(scores, axis=1) <= 1e-6)     # sorted best-first
    toks = np.asarray(out["tokens"])
    lens = np.asarray(out["lengths"])
    for i in range(toks.shape[0]):
        for wday in range(4):
            row = toks[i, wday]
            assert np.all(row[: lens[i, wday]] > 0)
            assert np.all(row[lens[i, wday]:] == -1)
    out2 = transducer_beam_search(model, params, feats, flens, beam=4,
                                  max_tokens=16)
    np.testing.assert_array_equal(toks, np.asarray(out2["tokens"]))

    # the greedy/beam-1 best score never beats the beam-4 best
    out1 = transducer_beam_search(model, params, feats, flens, beam=1,
                                  max_tokens=16)
    assert np.all(np.asarray(out1["scores"])[:, 0]
                  <= scores[:, 0] + 1e-5)


def test_recognizer_transducer_beam_mode():
    from tpu_asr.decode.beam import BeamConfig
    from tpu_asr.decode.recognizer import Recognizer
    rng = np.random.default_rng(8)
    cfg = tiny_cfg()
    batch = make_batch(rng)
    model, params = init_model(cfg, batch)
    rec = Recognizer(cfg=cfg, params=params, mode="transducer_beam",
                     beam=BeamConfig(beam=3, max_len=16, nbest=2))
    hyps = rec.decode_batch_nbest(
        {"feats": batch[0], "feat_lengths": batch[1]})
    assert len(hyps) == 3 and all(len(h) == 2 for h in hyps)
    assert all(h[0]["score"] >= h[1]["score"] for h in hyps)


@pytest.mark.slow
def test_transducer_data_parallel_mesh_step():
    """The transducer train step runs SPMD data-parallel unchanged (the
    step is model-agnostic; this pins the new loss under GSPMD)."""
    import jax as _jax
    from tpu_asr.parallel import make_mesh, replicated, shard_batch
    from tpu_asr.train import TrainState, make_optimizer
    from tpu_asr.train.loop import make_train_step
    assert len(_jax.devices()) == 8, "conftest must fake 8 CPU devices"
    rng = np.random.default_rng(9)
    cfg = tiny_cfg(ctc_weight=0.3)
    feats = rng.standard_normal((8, 64, 80)).astype(np.float32)
    flens = np.full(8, 64, np.int32)
    targets = rng.integers(1, 10, (8, 5)).astype(np.int32)
    tlens = np.full(8, 5, np.int32)
    model, params = init_model(cfg, (feats, flens, targets, tlens))
    mesh = make_mesh()
    tx = make_optimizer(cfg.d_model, warmup_steps=10, k=5.0)
    state = TrainState.create(params["params"], tx, jax.random.PRNGKey(1))
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(model, tx, donate=False, mesh=mesh)
    batch = shard_batch(dict(feats=feats, feat_lengths=flens,
                             targets=targets, target_lengths=tlens), mesh)
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert jax.tree.leaves(state.params)[0].sharding.is_fully_replicated


@pytest.mark.slow
def test_beam_lm_fusion_matches_host_oracle():
    """Fused ALSD beam-1 == a host loop that scores label extensions with
    acoustic + lm_weight * teacher-forced LM log-probs (independent oracle
    for both the fusion arithmetic and the LM step_at cache path)."""
    from tpu_asr.decode.transducer_decode import transducer_beam_search
    from tpu_asr.models.lm import LMConfig, TransformerLM
    rng = np.random.default_rng(10)
    cfg = tiny_cfg()
    batch = make_batch(rng, b=2)
    model, params = init_model(cfg, batch)
    lm_cfg = LMConfig(vocab_size=cfg.vocab_size, d_model=16, d_inner=32,
                      num_heads=2, num_layers=1, dropout=0.0)
    lm = TransformerLM(lm_cfg)
    lm_v = lm.init(jax.random.PRNGKey(3), jnp.zeros((1, 4), jnp.int32))
    lam = 0.7
    feats, flens = batch[0][:2], batch[1][:2]

    out = transducer_beam_search(model, params, jnp.asarray(feats),
                                 jnp.asarray(flens), beam=1, max_tokens=12,
                                 lm=lm, lm_params=lm_v, lm_weight=lam)

    sos, blank = cfg.vocab_size - 2, 0
    for i in range(2):
        enc, el = model.apply(params, jnp.asarray(feats[i: i + 1]),
                              jnp.asarray(flens[i: i + 1]), method="encode")
        f = model.apply(params, enc, method="enc_features")[0]
        cache = model.apply(params, 1, 13, method="predictor_init_cache")
        g, cache = model.apply(params, jnp.array([sos], jnp.int32),
                               jnp.array([0], jnp.int32), cache,
                               method="predictor_step")
        toks, score, t = [], 0.0, 0
        while t < int(el[0]):
            logits = model.apply(params, f[t: t + 1], g,
                                 method="joint_step")
            lp = np.asarray(jax.nn.log_softmax(logits[0]))
            # teacher-forced LM next-token distribution given history
            ys = jnp.asarray([[sos] + toks], jnp.int32)
            lm_lp = np.asarray(jax.nn.log_softmax(
                lm.apply(lm_v, ys).astype(jnp.float32)[0, -1]))
            fused = lp + lam * lm_lp
            fused[blank] = -1e30           # blank compared unfused
            fused[cfg.vocab_size - 2:] = -1e30
            best_lab = int(np.argmax(fused))
            if lp[blank] >= fused[best_lab] or len(toks) >= 12:
                score += lp[blank]
                t += 1
            else:
                score += fused[best_lab]
                toks.append(best_lab)
                g, cache = model.apply(
                    params, jnp.array([best_lab], jnp.int32),
                    jnp.array([len(toks)], jnp.int32), cache,
                    method="predictor_step")
        got = [int(x) for x in np.asarray(out["tokens"])[i, 0,
                                                         : int(out["lengths"][i, 0])]]
        assert got == toks, (i, got, toks)
        assert float(out["scores"][i, 0]) == pytest.approx(score, abs=1e-3)


@pytest.mark.slow
def test_mesh_transducer_decode_equals_single_device():
    """Data-parallel transducer decode (greedy while_loop + ALSD beam with
    per-row scatters and one-hot reorders) under GSPMD returns identical
    hypotheses to single-device."""
    from tpu_asr.decode.beam import BeamConfig
    from tpu_asr.decode.recognizer import Recognizer
    from tpu_asr.parallel import make_mesh
    rng = np.random.default_rng(11)
    batch_arrays = make_batch(rng, b=3)
    cfg = tiny_cfg()
    model, params = init_model(cfg, batch_arrays)
    feats = np.concatenate([batch_arrays[0], batch_arrays[0][:1]], 0)
    flens = np.concatenate([batch_arrays[1], batch_arrays[1][:1]])
    batch = {"feats": feats, "feat_lengths": flens}
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    for mode, beam in [("transducer_greedy", BeamConfig(beam=1, max_len=12)),
                       ("transducer_beam",
                        BeamConfig(beam=3, max_len=12, nbest=2))]:
        ref = Recognizer(cfg=cfg, params=params, mode=mode,
                         beam=beam).decode_batch_nbest(batch)
        got = Recognizer(cfg=cfg, params=params, mode=mode, beam=beam,
                         mesh=mesh).decode_batch_nbest(batch)
        assert len(got) == len(ref) == 4
        for r, g in zip(ref, got):
            for hr, hg in zip(r, g):
                assert hg["yseq"] == hr["yseq"], mode


def test_transducer_rescore_scores_decompose():
    """Rescore mode: final = -NLL_rnnt + ctc_weight * ctc_score, with the
    NLL recomputed independently via ops.transducer.transducer_loss; the
    result is sorted best-first."""
    from tpu_asr.decode.beam import BeamConfig
    from tpu_asr.decode.recognizer import Recognizer
    from tpu_asr.ops.transducer import transducer_loss
    rng = np.random.default_rng(12)
    cfg = tiny_cfg(ctc_weight=0.3)
    batch = make_batch(rng)
    model, params = init_model(cfg, batch)
    feats, flens = batch[0], batch[1]
    rec = Recognizer(cfg=cfg, params=params, mode="transducer_rescore",
                     beam=BeamConfig(beam=4, max_len=12, nbest=2,
                                     ctc_weight=0.5))
    out = rec._transducer_rescore(params, None,
                                  {"feats": jnp.asarray(feats),
                                   "feat_lengths": jnp.asarray(flens)})
    scores = np.asarray(out["scores"])
    assert np.all(np.diff(scores, axis=1) <= 1e-6)
    np.testing.assert_allclose(
        scores,
        np.asarray(out["rnnt_scores"])
        + 0.5 * np.asarray(out["ctc_scores"]), rtol=1e-5, atol=1e-5)

    # recompute the 1-best rnnt score with a direct loss call
    enc_out, el = model.apply(params, jnp.asarray(feats),
                              jnp.asarray(flens), method="encode")
    f = model.apply(params, enc_out, method="enc_features")
    i = 0
    li = int(out["lengths"][i, 0])
    hyp = np.asarray(out["tokens"])[i, 0, :12]
    safe = np.where(hyp >= 0, hyp, 0).astype(np.int32)
    ys_in = jnp.concatenate(
        [jnp.full((1, 1), cfg.vocab_size - 2, jnp.int32),
         jnp.asarray(safe[None])], axis=1)
    g = model.apply(params, ys_in, method="predict_sequence")
    p = params["params"]
    nll = transducer_loss(
        f[i: i + 1], g, jnp.asarray(p["joint_out_kernel"]),
        jnp.asarray(p["joint_out_bias"]), jnp.asarray(safe[None]),
        el[i: i + 1], jnp.asarray([li], np.int32), reduction="none")
    assert float(out["rnnt_scores"][i, 0]) == pytest.approx(
        -float(nll[0]), abs=1e-3)

    # the public n-best API plumbs through
    hyps = rec.decode_batch_nbest({"feats": feats, "feat_lengths": flens})
    assert len(hyps) == 3 and all(len(h) == 2 for h in hyps)


def test_transducer_emission_times_streaming_equals_offline():
    """Emission timestamps (encoder frame per token) are global across
    streamed chunks and equal the offline decode's."""
    from tpu_asr.decode.streaming import StreamingTransducerRecognizer
    rng = np.random.default_rng(13)
    cfg = tiny_cfg(enc_chunk_size=4)
    batch = make_batch(rng)
    model, params = init_model(cfg, batch)
    t = 120
    feats = (rng.standard_normal((t, 80)) * 3).astype(np.float32)
    toks, lens, times, confs = transducer_greedy_decode(
        model, params, jnp.asarray(feats[None]), jnp.asarray([t], np.int32),
        max_tokens=24, return_times=True)
    n = int(lens[0])
    off_times = [int(x) for x in np.asarray(times)[0, :n]]
    assert off_times == sorted(off_times)          # monotonic
    rec = StreamingTransducerRecognizer(cfg, params, max_frames=256,
                                        max_tokens=24)
    rec.push(feats[:50]); rec.push(feats[50:])
    rec.finish()
    assert rec.hypothesis_times == off_times
    n2 = len(rec.hypothesis)
    off_confs = [round(float(x), 4) for x in np.asarray(confs)[0, :n2]]
    assert rec.hypothesis_confidence == off_confs
    assert all(0.0 < c <= 1.0 for c in off_confs)
