"""Frontend tests: framing, log-mel vs a straightforward numpy/scipy-free
reference, CMVN, LFR stacking vs a python-loop reference."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_asr import frontend as F


CFG = F.FrontendConfig()


def ref_logmel(wav, cfg):
    """Independent numpy implementation (rfft-based) as the oracle."""
    n = cfg.num_frames(len(wav))
    win = F._window_coeffs(cfg)
    mel = F.mel_filterbank(cfg)
    out = np.zeros((n, cfg.num_mel_bins))
    for i in range(n):
        fr = wav[i * cfg.frame_shift: i * cfg.frame_shift + cfg.frame_length].astype(np.float64)
        fr = fr - fr.mean()
        fr = fr - cfg.preemphasis * np.concatenate([fr[:1], fr[:-1]])
        fr = fr * win
        spec = np.abs(np.fft.rfft(fr, cfg.fft_size)) ** 2
        out[i] = np.log(np.maximum(spec @ mel, cfg.log_floor))
    return out


def test_num_frames():
    assert CFG.frame_length == 400 and CFG.frame_shift == 160
    assert CFG.fft_size == 512
    assert CFG.num_frames(400) == 1
    assert CFG.num_frames(399) == 0
    assert CFG.num_frames(16000) == 98


def test_logmel_matches_numpy_reference(rng):
    wav = rng.standard_normal(4000).astype(np.float32)
    got = np.asarray(F.log_mel_spectrogram(jnp.asarray(wav)[None], CFG))[0]
    want = ref_logmel(wav, CFG)
    assert got.shape == want.shape == (CFG.num_frames(4000), 80)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_covers_spectrum():
    fb = F.mel_filterbank(CFG)
    assert fb.shape == (257, 80)
    # Each filter has some mass; interior bins covered by at least one filter.
    assert (fb.sum(axis=0) > 0).all()
    coverage = fb.sum(axis=1)
    lo_bin = int(np.ceil(CFG.low_freq / (CFG.sample_rate / CFG.fft_size))) + 2
    assert (coverage[lo_bin:-2] > 0).all()


def test_cmvn_masks_padding(rng):
    x = rng.standard_normal((2, 50, 8)).astype(np.float32)
    lengths = jnp.asarray([50, 30])
    out = np.asarray(F.cmvn(jnp.asarray(x), lengths))
    # valid region of utt 1 is zero-mean unit-var
    v = out[1, :30]
    np.testing.assert_allclose(v.mean(axis=0), 0, atol=1e-5)
    np.testing.assert_allclose(v.std(axis=0), 1, atol=1e-3)


def test_lfr_matches_loop(rng):
    x = rng.standard_normal((10, 4)).astype(np.float32)
    m, n = 4, 3
    got = np.asarray(F.build_lfr_features(jnp.asarray(x), m, n))
    t_out = (10 + n - 1) // n
    assert got.shape == (t_out, m * 4)
    for i in range(t_out):
        want = np.concatenate([x[min(i * n + j, 9)] for j in range(m)])
        np.testing.assert_allclose(got[i], want)


def test_wav_to_features_zeroes_padding(rng):
    wav = rng.standard_normal((2, 8000)).astype(np.float32)
    lengths = jnp.asarray([8000, 4000])
    feats, flen = F.wav_to_features(jnp.asarray(wav), lengths, CFG)
    flen = np.asarray(flen)
    assert flen[0] == CFG.num_frames(8000)
    assert flen[1] == CFG.num_frames(4000)
    assert np.all(np.asarray(feats)[1, flen[1]:] == 0)


def test_spec_augment_shapes(rng):
    import jax
    from tpu_asr.augment import spec_augment, SpecAugmentConfig
    feats = jnp.asarray(rng.standard_normal((3, 100, 80)).astype(np.float32))
    lengths = jnp.asarray([100, 60, 20])
    out = spec_augment(jax.random.PRNGKey(0), feats, lengths, SpecAugmentConfig())
    assert out.shape == feats.shape
    # Some but not all values masked
    zeroed = np.asarray(out == 0).mean()
    assert 0.0 < zeroed < 0.9


def test_time_warp_properties(rng):
    import jax
    from tpu_asr.augment import _time_warp, spec_augment, SpecAugmentConfig
    b, t, d = 4, 100, 8
    feats = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    lengths = jnp.asarray([100, 60, 10, 37])
    feats = feats * (np.arange(t)[None, :, None] < np.asarray(lengths)[:, None, None])
    out = np.asarray(_time_warp(jax.random.PRNGKey(3), feats, lengths, 5))
    fin = np.asarray(feats)
    assert out.shape == fin.shape
    # frames past the valid length untouched; warp endpoints anchored
    for i, L in enumerate([100, 60, 10, 37]):
        assert np.array_equal(out[i, L:], fin[i, L:])
        np.testing.assert_allclose(out[i, 0], fin[i, 0], rtol=1e-6)
        np.testing.assert_allclose(out[i, L - 1], fin[i, L - 1], rtol=1e-5)
    # utterance 2 (len 10 <= 2W+1): identity
    assert np.array_equal(out[2], fin[2])
    # lerp stays inside the per-feature envelope
    assert out.max() <= fin.max() + 1e-5 and out.min() >= fin.min() - 1e-5
    # something actually moved on the long utterances (overwhelmingly likely)
    assert not np.array_equal(out[0, :100], fin[0, :100])
    # full spec_augment with warp enabled runs under jit, keeps shape
    cfg = SpecAugmentConfig(time_warp_window=5)
    out2 = jax.jit(lambda k, f, l: spec_augment(k, f, l, cfg))(
        jax.random.PRNGKey(0), feats, lengths)
    assert out2.shape == feats.shape


def test_time_warp_ramp_monotonic(rng):
    import jax
    from tpu_asr.augment import _time_warp
    # a linear time ramp must stay monotonically non-decreasing under the
    # piecewise-linear warp (the index map is monotonic)
    t = 80
    ramp = jnp.broadcast_to(jnp.arange(t, dtype=jnp.float32)[None, :, None],
                            (2, t, 3))
    lengths = jnp.asarray([80, 80])
    out = np.asarray(_time_warp(jax.random.PRNGKey(11), ramp, lengths, 8))
    assert (np.diff(out[:, :, 0], axis=1) >= -1e-4).all()


def test_global_cmvn_mode(tmp_path):
    """cmvn_mode=global normalizes with precomputed stats (Kaldi
    apply-cmvn semantics); sidecar round-trips through Checkpointer."""
    import dataclasses

    from tpu_asr.frontend import (FrontendConfig, load_cmvn_stats,
                                  wav_to_features)
    rng = np.random.default_rng(0)
    mean = rng.standard_normal(80).astype(np.float32)
    istd = (0.5 + rng.random(80)).astype(np.float32)
    stats = tmp_path / "cmvn.npz"
    np.savez(stats, mean=mean, istd=istd, frames=np.int64(1000))

    wav = (rng.standard_normal(4000) * 0.1).astype(np.float32)
    base_cfg = FrontendConfig()
    raw, fl = wav_to_features(jnp.asarray(wav[None]),
                              jnp.asarray([len(wav)]), base_cfg,
                              apply_cmvn=False)
    gcfg = dataclasses.replace(base_cfg, cmvn_mode="global",
                               cmvn_stats_path=str(stats))
    got, _ = wav_to_features(jnp.asarray(wav[None]),
                             jnp.asarray([len(wav)]), gcfg)
    n = int(fl[0])
    want = (np.asarray(raw)[0, :n] - mean) * istd
    np.testing.assert_allclose(np.asarray(got)[0, :n], want,
                               rtol=1e-5, atol=1e-5)
    # zero-padding preserved past the valid frames
    assert np.all(np.asarray(got)[0, n:] == 0.0)
    m2, i2, fp = load_cmvn_stats(str(stats))
    np.testing.assert_array_equal(m2, mean)
    np.testing.assert_array_equal(i2, istd)
    assert fp is None                  # pre-fingerprint file: accepted

    # cmvn_mode=none leaves features raw
    ncfg = dataclasses.replace(base_cfg, cmvn_mode="none")
    raw2, _ = wav_to_features(jnp.asarray(wav[None]),
                              jnp.asarray([len(wav)]), ncfg)
    np.testing.assert_allclose(np.asarray(raw2)[0, :n],
                               np.asarray(raw)[0, :n], rtol=1e-6)

    # frontend sidecar round-trip
    from tpu_asr.train.checkpoints import Checkpointer
    ck = Checkpointer(str(tmp_path / "exp"))
    ck.save_frontend(gcfg)
    back = ck.load_frontend()
    assert back == gcfg


def test_global_cmvn_fingerprint_mismatch(tmp_path):
    """Stats carrying a fingerprint from a DIFFERENT frontend are
    rejected with a clear error instead of silently mis-normalizing
    (ADVICE r3); a matching fingerprint is accepted."""
    import dataclasses

    import pytest

    from tpu_asr.frontend import (FrontendConfig, feature_fingerprint,
                                  wav_to_features)
    rng = np.random.default_rng(1)
    other = dataclasses.replace(FrontendConfig(), num_mel_bins=40)
    stats = tmp_path / "cmvn40.npz"
    np.savez(stats, mean=np.zeros(40, np.float32),
             istd=np.ones(40, np.float32), frames=np.int64(10),
             fingerprint=np.str_(feature_fingerprint(other)))
    wav = (rng.standard_normal(4000) * 0.1).astype(np.float32)
    gcfg = dataclasses.replace(FrontendConfig(), cmvn_mode="global",
                               cmvn_stats_path=str(stats))
    with pytest.raises(ValueError, match="different frontend"):
        wav_to_features(jnp.asarray(wav[None]), jnp.asarray([len(wav)]),
                        gcfg)

    good = tmp_path / "cmvn80.npz"
    np.savez(good, mean=np.zeros(80, np.float32),
             istd=np.ones(80, np.float32), frames=np.int64(10),
             fingerprint=np.str_(feature_fingerprint(FrontendConfig())))
    gcfg2 = dataclasses.replace(FrontendConfig(), cmvn_mode="global",
                                cmvn_stats_path=str(good))
    out, _ = wav_to_features(jnp.asarray(wav[None]),
                             jnp.asarray([len(wav)]), gcfg2)
    assert np.isfinite(np.asarray(out)).all()


# ---- pitch features (Kaldi fbank+pitch capability; frontend.pitch_features)

PCFG = F.FrontendConfig(add_pitch=True)


def test_pitch_recovers_pure_tone_f0(rng):
    # NCCF on a clean periodic signal must find the true lag: 220 Hz at
    # 16 kHz is a NON-integer lag (72.7 samples), so this also exercises
    # the parabolic sub-lag refinement.
    sr = PCFG.sample_rate
    t = np.arange(sr) / sr  # 1 s
    for f0 in (110.0, 220.0, 330.0):
        wav = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        n_fr = PCFG.num_frames(sr)
        out = np.asarray(F.pitch_features(
            jnp.asarray(wav)[None], jnp.asarray([n_fr]), PCFG))[0]
        pov, norm_lp, delta = out[..., 0], out[..., 1], out[..., 2]
        assert pov.shape == (n_fr,)
        assert (pov > 0.9).mean() > 0.95, f"low POV on pure {f0} Hz tone"
        # recover absolute f0 from the weighted-mean decomposition:
        # norm_lp = log f0 - mean => per-frame f0 must all be ~f0, so the
        # spread of norm_lp is tiny and the implied f0 matches.
        w = pov**2
        mean_lp = np.log(sr / (sr / f0))  # = log f0
        # invert: log_f0[t] = norm_lp[t] + weighted_mean(log_f0)
        # weighted mean is within a hair of log f0 when every frame is f0
        assert np.abs(norm_lp).max() < 0.02
        assert np.abs(delta).max() < 0.02


def test_pitch_pov_low_on_noise(rng):
    wav = rng.standard_normal(16000).astype(np.float32)
    n_fr = PCFG.num_frames(16000)
    out = np.asarray(F.pitch_features(
        jnp.asarray(wav)[None], jnp.asarray([n_fr]), PCFG))[0]
    tone = np.sin(2 * np.pi * 200.0 * np.arange(16000) / 16000)
    tout = np.asarray(F.pitch_features(
        jnp.asarray(tone.astype(np.float32))[None],
        jnp.asarray([n_fr]), PCFG))[0]
    # white noise has far weaker periodicity evidence than a tone
    assert out[..., 0].mean() < 0.6
    assert out[..., 0].mean() < tout[..., 0].mean() - 0.3


def test_pitch_step_change_shows_in_delta():
    sr = PCFG.sample_rate
    t = np.arange(sr) / sr
    half = sr // 2
    wav = np.concatenate([np.sin(2 * np.pi * 150 * t[:half]),
                          np.sin(2 * np.pi * 300 * t[:half])]).astype(np.float32)
    n_fr = PCFG.num_frames(sr)
    out = np.asarray(F.pitch_features(
        jnp.asarray(wav)[None], jnp.asarray([n_fr]), PCFG))[0]
    norm_lp = out[..., 1]
    # frames well inside each half sit on opposite sides of the weighted mean
    a = norm_lp[5:20].mean()
    b = norm_lp[-20:-5].mean()
    assert b - a > 0.5  # log(300/150) = 0.69 split across the mean


def test_wav_to_features_with_pitch_shape_and_masking(rng):
    wav = rng.standard_normal((2, 8000)).astype(np.float32)
    lens = np.array([8000, 4000], np.int32)
    feats, flens = F.wav_to_features(jnp.asarray(wav), jnp.asarray(lens), PCFG)
    assert PCFG.feature_dim == 83
    assert feats.shape == (2, PCFG.num_frames(8000), 83)
    # padding frames zeroed across ALL dims including pitch
    assert np.all(np.asarray(feats)[1, int(flens[1]):] == 0.0)


def test_pitch_fingerprint_and_sidecar_roundtrip(tmp_path):
    assert F.feature_fingerprint(PCFG) != F.feature_fingerprint(CFG)
    from tpu_asr.train.checkpoints import Checkpointer
    ck = Checkpointer(str(tmp_path))
    ck.save_frontend(PCFG)
    got = ck.load_frontend()
    assert got.add_pitch and got.feature_dim == 83


# ---- Viterbi lag smoothing (pitch_smooth_weight > 0) ----

def test_viterbi_lags_resolves_octave_decoys():
    """Direct DP property: on a lattice where scattered frames carry a
    slightly HIGHER peak at half the true lag (the octave-up decoy a
    per-frame picker takes), the smoothed track stays on the true lag."""
    min_lag, max_lag, t = 40, 120, 50
    true_lag = 80
    band = np.full((t, max_lag - min_lag + 1), -0.2, np.float32)
    band[:, true_lag - min_lag] = 0.9
    decoy_frames = list(range(3, t, 7))
    for i in decoy_frames:
        band[i, true_lag // 2 - min_lag] = 0.93    # beats the true peak
    greedy = np.argmax(band, axis=-1) + min_lag
    assert all(greedy[i] == true_lag // 2 for i in decoy_frames)
    smoothed = np.asarray(F._viterbi_lags(
        jnp.asarray(band), min_lag, max_lag, weight=4.0))
    # an octave jump costs 2 * 4 * log(2)^2 ~ 3.8 against a 0.03 gain
    assert np.all(smoothed == true_lag), smoothed[decoy_frames]


def test_viterbi_lags_follows_genuine_changes():
    """Smoothing must not freeze the track: a gradual lag ramp with a
    clear peak is followed exactly (transition cost of one 2%-lag step
    is tiny vs the peak margin)."""
    min_lag, max_lag, t = 40, 120, 60
    path = np.linspace(60, 100, t).round().astype(int)
    band = np.full((t, max_lag - min_lag + 1), -0.2, np.float32)
    band[np.arange(t), path - min_lag] = 0.9
    smoothed = np.asarray(F._viterbi_lags(
        jnp.asarray(band), min_lag, max_lag, weight=4.0))
    assert np.abs(smoothed - path).max() <= 1


def test_pitch_smoothing_on_vibrato_tone():
    """End-to-end on a 6 Hz vibrato tone (f0 = 200 +/- 20 Hz) with a
    strong second harmonic and additive noise: the smoothed log-pitch
    contour must (a) contain no octave-sized frame-to-frame jumps,
    (b) track the true vibrato contour, and (c) reduce to the greedy
    picker's result on a clean stationary tone (no distortion where
    per-frame picking is already right)."""
    sr = PCFG.sample_rate
    scfg = dataclasses.replace(PCFG, pitch_smooth_weight=4.0)
    tt = np.arange(sr) / sr
    f0 = 200.0 + 20.0 * np.sin(2 * np.pi * 6.0 * tt)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    rng = np.random.default_rng(0)
    wav = (np.sin(phase) + 0.8 * np.sin(2 * phase)
           + 0.25 * rng.standard_normal(sr)).astype(np.float32)
    n_fr = PCFG.num_frames(sr)
    out = np.asarray(F.pitch_features(
        jnp.asarray(wav)[None], jnp.asarray([n_fr]), scfg))[0]
    pov, norm_lp = out[..., 0], out[..., 1]
    voiced = pov > 0.5
    assert voiced.mean() > 0.9
    # (a) adjacent-frame log-pitch moves are vibrato-sized, never octave
    jumps = np.abs(np.diff(norm_lp))[voiced[1:] & voiced[:-1]]
    assert jumps.max() < 0.5 * np.log(2), jumps.max()
    # (b) the contour matches log f0(frame center) - weighted mean
    centers = (np.arange(n_fr) * PCFG.frame_shift
               + PCFG.frame_length // 2)
    lf = np.log(f0[np.minimum(centers, sr - 1)])
    w = (pov ** 2)[voiced]
    expect = lf[voiced] - (w * lf[voiced]).sum() / w.sum()
    err = np.abs(norm_lp[voiced] - expect)
    assert np.percentile(err, 95) < 0.05, np.percentile(err, 95)
    # (c) clean stationary tone: smoothing changes nothing material
    tone = np.sin(2 * np.pi * 220.0 * tt).astype(np.float32)
    a = np.asarray(F.pitch_features(
        jnp.asarray(tone)[None], jnp.asarray([n_fr]), PCFG))[0]
    b = np.asarray(F.pitch_features(
        jnp.asarray(tone)[None], jnp.asarray([n_fr]), scfg))[0]
    np.testing.assert_allclose(a[..., 1], b[..., 1], atol=5e-3)
