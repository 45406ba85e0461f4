"""On-device acoustic frontend: waveform -> 80-dim log-mel fbank.

TPU-native replacement for the reference's *offline* Kaldi feature pipeline
(reference: egs/aishell/run.sh stages 1-2 — `compute-fbank-feats`,
`compute-cmvn-stats`, `apply-cmvn`, all host-side C++) and for the LFR frame
stacking done in its data loader (reference: src/data/data.py
`build_LFR_features(x, m, n)`).

Everything here is pure jnp on statically-shaped, padded batches, so the whole
frontend fuses into the first encoder matmuls under jit. Batches of raw
waveforms stream HBM->VMEM once; framing is a reshape/gather, the DFT is a
matmul on the MXU (precomputed real/imag DFT basis — faster than jnp.fft.rfft
for these small fixed sizes and bf16-friendly), and the mel projection is
another matmul.

Conventions follow Kaldi fbank defaults (dither off): 25 ms window / 10 ms
hop @ 16 kHz, remove-DC-offset per frame, preemphasis 0.97, povey window,
512-point FFT, 80 mel bins from 20 Hz to Nyquist, natural log, snip-edges.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 80
    low_freq: float = 20.0
    high_freq: float = 0.0       # <= 0 means offset from Nyquist (Kaldi style)
    preemphasis: float = 0.97
    window: str = "povey"        # povey | hann | hamming
    use_log: bool = True
    log_floor: float = 1e-10
    remove_dc: bool = True
    dtype: jnp.dtype = jnp.float32
    # CMVN policy (reference: compute-cmvn-stats + apply-cmvn over the
    # TRAIN set's global stats; per-utterance online normalization is this
    # repo's default). "global" loads mean/istd from cmvn_stats_path (an
    # .npz written by bin/compute_cmvn.py) — the causal choice for
    # streaming, where per-utterance stats would peek at future frames.
    cmvn_mode: str = "utterance"  # utterance | global | none
    cmvn_stats_path: str = ""
    # Pitch (reference recipe family: Kaldi "fbank+pitch" pastes 3 pitch
    # dims — POV, normalized log-pitch, delta-pitch — onto the fbank;
    # egs/aishell/run.sh feature-extraction stage). Off by default:
    # BASELINE.json pins 80-dim log-mel only. See `pitch_features`.
    add_pitch: bool = False
    pitch_min_f0: float = 60.0
    pitch_max_f0: float = 400.0
    # Lag smoothing across frames: 0.0 = per-frame peak picking
    # (shortest-lag-within-threshold); > 0 = Viterbi DP over the lag
    # lattice with transition cost w * (log lag_t - log lag_{t-1})^2 —
    # the same role as Kaldi's lag tracker, resolving octave errors a
    # per-frame picker passes through. 4.0 is a good starting weight
    # (NCCF peaks are ~O(1); an octave jump costs 4*log(2)^2 ~ 1.9).
    pitch_smooth_weight: float = 0.0

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000.0)

    @property
    def fft_size(self) -> int:
        n = 1
        while n < self.frame_length:
            n *= 2
        return n

    def num_frames(self, num_samples: int) -> int:
        """Snip-edges frame count for a given number of samples."""
        if num_samples < self.frame_length:
            return 0
        return 1 + (num_samples - self.frame_length) // self.frame_shift

    @property
    def feature_dim(self) -> int:
        """Per-frame output dim of wav_to_features (mel bins + pitch)."""
        return self.num_mel_bins + (3 if self.add_pitch else 0)


def _window_coeffs(cfg: FrontendConfig) -> np.ndarray:
    n = cfg.frame_length
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n, dtype=np.float64)
    if cfg.window == "hann":
        w = 0.5 - 0.5 * np.cos(a * i)
    elif cfg.window == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif cfg.window == "povey":
        w = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    else:
        raise ValueError(f"unknown window {cfg.window!r}")
    return w.astype(np.float64)


def mel_filterbank(cfg: FrontendConfig) -> np.ndarray:
    """[fft_size//2+1, num_mel_bins] triangular mel filterbank (Kaldi-style)."""
    def hz_to_mel(hz):
        return 1127.0 * np.log(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)

    nyquist = cfg.sample_rate / 2.0
    high = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    n_bins = cfg.fft_size // 2 + 1
    mel_lo, mel_hi = hz_to_mel(cfg.low_freq), hz_to_mel(high)
    # Bin edges in mel space: num_mel_bins + 2 points.
    mel_pts = np.linspace(mel_lo, mel_hi, cfg.num_mel_bins + 2)
    fft_freqs = np.arange(n_bins, dtype=np.float64) * cfg.sample_rate / cfg.fft_size
    fft_mels = hz_to_mel(fft_freqs)
    left, center, right = mel_pts[:-2], mel_pts[1:-1], mel_pts[2:]
    # [n_bins, n_mels] triangle responses in mel space (Kaldi interpolates in mel).
    up = (fft_mels[:, None] - left[None, :]) / (center - left)[None, :]
    down = (right[None, :] - fft_mels[:, None]) / (right - center)[None, :]
    fb = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float64)


def _dft_basis(cfg: FrontendConfig) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases [frame_length, fft_size//2+1] (zero-padded DFT)."""
    n_fft = cfg.fft_size
    n_bins = n_fft // 2 + 1
    t = np.arange(cfg.frame_length, dtype=np.float64)
    k = np.arange(n_bins, dtype=np.float64)
    ang = -2.0 * math.pi * t[:, None] * k[None, :] / n_fft
    return np.cos(ang), np.sin(ang)


@functools.lru_cache(maxsize=8)
def _frontend_constants(cfg: FrontendConfig):
    win = _window_coeffs(cfg)
    cos_b, sin_b = _dft_basis(cfg)
    # Fold the window into the DFT basis: one matmul does window+DFT.
    cos_b = cos_b * win[:, None]
    sin_b = sin_b * win[:, None]
    mel = mel_filterbank(cfg)
    # numpy, NOT jnp: this cache may first be hit INSIDE a jit trace
    # (e.g. a server warming up the wav decode program), and jnp.asarray
    # there stages a device_put whose tracer would be cached and escape.
    # numpy constants are embedded per-trace by the consuming jnp ops.
    f32 = np.float32
    return cos_b.astype(f32), sin_b.astype(f32), mel.astype(f32)


def frame_signal(wav: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """[..., S] waveform -> [..., T, frame_length] frames (snip-edges).

    S must be static; T = cfg.num_frames(S).
    """
    num_samples = wav.shape[-1]
    t = cfg.num_frames(num_samples)
    starts = np.arange(t) * cfg.frame_shift
    idx = starts[:, None] + np.arange(cfg.frame_length)[None, :]
    return wav[..., idx]


def log_mel_spectrogram(
    wav: jnp.ndarray,
    cfg: FrontendConfig = FrontendConfig(),
) -> jnp.ndarray:
    """Batched waveform [..., S] -> log-mel features [..., T, num_mel_bins].

    Pure function of statically-shaped input; jit/pjit friendly. Padding
    samples produce garbage frames past the true frame count — mask with
    `frame_lengths` (see `wav_to_features`).
    """
    cos_b, sin_b, mel = _frontend_constants(cfg)
    frames = frame_signal(wav.astype(jnp.float32), cfg)  # [..., T, L]
    if cfg.remove_dc:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if cfg.preemphasis > 0.0:
        # Kaldi: first sample preemphasized against itself.
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - cfg.preemphasis * prev
    # Window folded into DFT basis; two matmuls on the MXU. Full f32
    # accumulation: spectral magnitudes at bf16-class matmul precision lose
    # too much before the log.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.einsum("...tl,lk->...tk", frames, cos_b, precision=hi)
    im = jnp.einsum("...tl,lk->...tk", frames, sin_b, precision=hi)
    power = re * re + im * im
    melspec = jnp.einsum("...tk,km->...tm", power, mel, precision=hi)
    if cfg.use_log:
        melspec = jnp.log(jnp.maximum(melspec, cfg.log_floor))
    return melspec.astype(cfg.dtype)


def cmvn(
    feats: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    norm_var: bool = True,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Per-utterance cepstral mean (and variance) normalization.

    feats: [..., T, D]; lengths: [...] valid frame counts (None = all valid).
    Replacement for Kaldi's apply-cmvn over precomputed stats; per-utterance
    online normalization computed on device.
    """
    if lengths is None:
        mean = jnp.mean(feats, axis=-2, keepdims=True)
        var = jnp.mean(jnp.square(feats - mean), axis=-2, keepdims=True)
    else:
        t = feats.shape[-2]
        mask = (jnp.arange(t) < lengths[..., None]).astype(feats.dtype)[..., None]
        denom = jnp.maximum(jnp.sum(mask, axis=-2, keepdims=True), 1.0)
        mean = jnp.sum(feats * mask, axis=-2, keepdims=True) / denom
        var = jnp.sum(jnp.square(feats - mean) * mask, axis=-2, keepdims=True) / denom
    out = feats - mean
    if norm_var:
        out = out * jax.lax.rsqrt(var + eps)
    return out


@functools.lru_cache(maxsize=8)
def _pitch_constants(cfg: FrontendConfig):
    """Lag range + DFT bases for the per-frame NCCF cross-correlation.

    numpy (not jnp) for the same tracer-leak reason as
    `_frontend_constants`. The correlation r[l] = sum_i x[i]*x[i+l] for
    every lag l in one shot rides the MXU as three matmuls: DFT of the
    n-sample frame, DFT of the (n+max_lag+1)-sample segment, and an
    inverse-DFT projection onto just the lag taps we need — O(T*seg*K)
    instead of the O(T*n_lags*n) of direct correlation.
    """
    min_lag = max(2, int(cfg.sample_rate / cfg.pitch_max_f0))
    max_lag = int(math.ceil(cfg.sample_rate / cfg.pitch_min_f0))
    n = cfg.frame_length
    seg = n + max_lag + 2          # +2: parabolic neighbor at max_lag+1
    k = seg // 2 + 1               # real-DFT bins (any length works for
    #                                an explicit-basis DFT; no pow2 pad)
    i = np.arange(seg, dtype=np.float64)
    kk = np.arange(k, dtype=np.float64)
    ang = 2.0 * math.pi * i[:, None] * kk[None, :] / seg
    cos_b, sin_b = np.cos(ang), np.sin(ang)
    # Inverse basis onto lags 0..max_lag+1, real-part weights folded
    # (w=1 for k=0 and the Nyquist bin when seg is even, else 2).
    w = np.full(k, 2.0)
    w[0] = 1.0
    if seg % 2 == 0:
        w[-1] = 1.0
    lags = np.arange(max_lag + 2, dtype=np.float64)
    lang = 2.0 * math.pi * lags[:, None] * kk[None, :] / seg
    inv_cos = (np.cos(lang) * w[None, :] / seg).T   # [K, n_lags]
    inv_sin = (np.sin(lang) * w[None, :] / seg).T
    f32 = np.float32
    return (min_lag, max_lag,
            cos_b[:n].astype(f32), sin_b[:n].astype(f32),   # frame DFT
            cos_b.astype(f32), sin_b.astype(f32),           # segment DFT
            inv_cos.astype(f32), inv_sin.astype(f32))


def _viterbi_lags(band: jnp.ndarray, min_lag: int, max_lag: int,
                  weight: float) -> jnp.ndarray:
    """Smoothed lag track over the NCCF lattice.

    band [..., T, L] = NCCF at lags min_lag..max_lag. Maximizes
    sum_t nccf[t, lag_t] - weight * sum_t (log lag_t - log lag_{t-1})^2
    with a max-product forward scan + backtrace — the role of Kaldi's
    online lag tracker (pitch-tracking cost in log-lag space penalizes
    octave jumps), in batched static-shape form: the per-frame
    relaxation over the [L, L] transition matrix is one max-reduction a
    TPU vectorizes, T stays a lax.scan. Remaining delta vs Kaldi
    (docs/PARITY.md): Kaldi's costs also depend on NCCF-derived POV and
    an f0-dependent soft floor; this is pure log-lag quadratic.
    Returns integer lags [..., T] in [min_lag, max_lag].
    """
    lags = np.arange(min_lag, max_lag + 1, dtype=np.float64)
    ll = np.log(lags)
    trans = (-weight * (ll[:, None] - ll[None, :]) ** 2).astype(np.float32)
    # time-major for the scan: [T, ..., L]
    x = jnp.moveaxis(band, -2, 0)

    def fwd(carry, x_t):
        # carry [..., Lp] + trans [Lp, Lc] -> best over prev lag
        scores = carry[..., :, None] + trans
        bptr = jnp.argmax(scores, axis=-2).astype(jnp.int32)  # [..., Lc]
        return jnp.max(scores, axis=-2) + x_t, bptr

    final, bptrs = jax.lax.scan(fwd, x[0], x[1:])
    last = jnp.argmax(final, axis=-1).astype(jnp.int32)       # [...]

    def back(state, bp_t):
        prev = jnp.take_along_axis(bp_t, state[..., None], axis=-1)[..., 0]
        return prev, state

    # reverse scan: ys[i] = state at time i+1 (the carry while consuming
    # the transition into i+1); the final carry is the state at time 0
    first, path_tail = jax.lax.scan(back, last, bptrs, reverse=True)
    path = jnp.concatenate([first[..., None],
                            jnp.moveaxis(path_tail, 0, -1)], axis=-1)
    return path + min_lag


def pitch_features(
    wav: jnp.ndarray,
    frame_lengths: jnp.ndarray | None,
    cfg: FrontendConfig,
) -> jnp.ndarray:
    """[..., S] waveform -> [..., T, 3] pitch features (POV, normalized
    log-pitch, delta-pitch), the three dims Kaldi's
    compute-and-process-kaldi-pitch-feats pastes onto fbank in the
    reference recipe family (egs/aishell run.sh "fbank+pitch" stage).

    Simplified vs Kaldi (documented, capability-parity not bit-parity):
    per-frame argmax-NCCF with parabolic lag interpolation instead of the
    Viterbi lag tracker, and utterance-level POV^2-weighted log-pitch mean
    instead of the 151-frame sliding window. Batched, statically shaped,
    every heavy op a matmul; an offline feature like per-utterance CMVN
    (the normalization peeks at the whole utterance — streaming paths
    keep add_pitch off).
    """
    (min_lag, max_lag, fcos, fsin, scos, ssin, icos, isin) = \
        _pitch_constants(cfg)
    n, shift = cfg.frame_length, cfg.frame_shift
    seg_len = scos.shape[0]
    s = wav.shape[-1]
    t = cfg.num_frames(s)
    starts = np.arange(t) * shift
    raw = starts[:, None] + np.arange(seg_len)[None, :]
    seg = wav.astype(jnp.float32)[..., np.minimum(raw, s - 1)]  # [..., T, seg]
    seg = seg - jnp.mean(seg[..., :n], axis=-1, keepdims=True)
    # Zero (don't edge-repeat) the part of the tail that runs past the
    # signal: a constant tail fakes long-lag periodicity on final frames.
    seg = seg * (raw < s).astype(seg.dtype)
    frame = seg[..., :n]
    hi = jax.lax.Precision.HIGHEST
    a_re = jnp.einsum("...tl,lk->...tk", frame, fcos, precision=hi)
    a_im = jnp.einsum("...tl,lk->...tk", frame, fsin, precision=hi)
    b_re = jnp.einsum("...tl,lk->...tk", seg, scos, precision=hi)
    b_im = jnp.einsum("...tl,lk->...tk", seg, ssin, precision=hi)
    # conj(A)*B, then inverse-DFT real part at lags 0..max_lag+1. The
    # frame DFT uses e^{+j} bases, so conj(A)_k = sum_i x_i e^{-j...}:
    # with both bases positive-angle, Re/Im of conj(A)B are:
    c_re = a_re * b_re + a_im * b_im
    c_im = a_re * b_im - a_im * b_re
    r = (jnp.einsum("...tk,kl->...tl", c_re, icos, precision=hi)
         + jnp.einsum("...tk,kl->...tl", c_im, isin, precision=hi))
    # Energy of every lag-shifted window via cumsum-of-squares.
    csum = jnp.cumsum(seg * seg, axis=-1)
    ends = np.arange(max_lag + 2) + n - 1             # lag window ends
    e2 = jnp.take(csum, ends, axis=-1)
    lo = jnp.take(csum, np.maximum(np.arange(max_lag + 2) - 1, 0), axis=-1)
    e2 = e2 - jnp.where(np.arange(max_lag + 2)[None, :] == 0, 0.0, lo)
    e1 = e2[..., :1]
    nccf = r / (jnp.sqrt(jnp.maximum(e1 * e2, 0.0)) + 1e-4 * n)
    # Peak over the valid lag range. A periodic signal scores ~equally at
    # every integer multiple of its period (subharmonic ambiguity; Kaldi
    # resolves it with a Viterbi lag tracker) — take the SHORTEST lag
    # within a small threshold of the peak, then refine parabolically.
    band = nccf[..., min_lag:max_lag + 1]
    if cfg.pitch_smooth_weight > 0.0:
        # Viterbi lag tracking (see _viterbi_lags): octave errors that
        # per-frame picking passes through cost weight*log(2)^2 each here
        best = _viterbi_lags(band, min_lag, max_lag,
                             cfg.pitch_smooth_weight)
    else:
        peak = jnp.max(band, axis=-1, keepdims=True)
        best = jnp.argmax(band >= peak - 0.025, axis=-1) + min_lag
    y0 = jnp.take_along_axis(nccf, best[..., None], axis=-1)[..., 0]
    ym = jnp.take_along_axis(nccf, best[..., None] - 1, axis=-1)[..., 0]
    yp = jnp.take_along_axis(nccf, best[..., None] + 1, axis=-1)[..., 0]
    denom = ym - 2.0 * y0 + yp
    off = jnp.where(jnp.abs(denom) > 1e-12,
                    0.5 * (ym - yp) / denom, 0.0)
    off = jnp.clip(off, -0.5, 0.5)
    lag = best.astype(jnp.float32) + off
    pov = jnp.clip(y0, 0.0, 1.0)
    log_f0 = jnp.log(cfg.sample_rate / lag)
    # Utterance-level POV^2-weighted mean of log-pitch (masked), then
    # mean-subtract; delta = central difference.
    if frame_lengths is not None:
        valid = (jnp.arange(t) < frame_lengths[..., None]).astype(jnp.float32)
    else:
        valid = jnp.ones_like(log_f0)
    w = pov * pov * valid + 1e-8
    mean_lp = (jnp.sum(w * log_f0, axis=-1, keepdims=True)
               / jnp.sum(w, axis=-1, keepdims=True))
    norm_lp = (log_f0 - mean_lp) * valid
    nxt = jnp.concatenate([log_f0[..., 1:], log_f0[..., -1:]], axis=-1)
    prv = jnp.concatenate([log_f0[..., :1], log_f0[..., :-1]], axis=-1)
    delta = 0.5 * (nxt - prv) * valid
    out = jnp.stack([pov * valid, norm_lp, delta], axis=-1)
    return out.astype(cfg.dtype)


def feature_fingerprint(cfg: FrontendConfig) -> str:
    """Canonical string of every FrontendConfig field that changes the
    feature space. Stored inside CMVN-stats .npz files so stats computed
    under one frontend can't silently normalize features from another
    (different n_mels / frame shift / window => different statistics)."""
    pitch = (f";pitch={cfg.pitch_min_f0}-{cfg.pitch_max_f0}"
             f";psmooth={cfg.pitch_smooth_weight}"
             if cfg.add_pitch else "")
    return (f"sr={cfg.sample_rate};flen={cfg.frame_length_ms};"
            f"fshift={cfg.frame_shift_ms};mels={cfg.num_mel_bins};"
            f"lo={cfg.low_freq};hi={cfg.high_freq};"
            f"preemph={cfg.preemphasis};win={cfg.window};"
            f"log={cfg.use_log};floor={cfg.log_floor};dc={cfg.remove_dc}"
            + pitch)


@functools.lru_cache(maxsize=8)
def load_cmvn_stats(
        path: str) -> tuple[np.ndarray, np.ndarray, str | None]:
    """(mean [D], istd [D], fingerprint-or-None) from an .npz written by
    bin/compute_cmvn.py (fingerprint absent in pre-r4 files).

    Cached as NUMPY on purpose: a jnp constant created inside a jit trace
    would leak a tracer through the cache (frontend._frontend_constants
    bug class, fixed r3)."""
    with np.load(path) as z:
        fp = str(z["fingerprint"]) if "fingerprint" in z else None
        return (np.asarray(z["mean"], np.float32),
                np.asarray(z["istd"], np.float32), fp)


def apply_global_cmvn(feats: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Normalize with precomputed train-set stats (Kaldi apply-cmvn).

    Rejects stats whose stored frontend fingerprint doesn't match the
    active config (ADVICE r3: stats computed with default features would
    otherwise silently mis-normalize a non-default frontend)."""
    assert cfg.cmvn_stats_path, "cmvn_mode=global needs cmvn_stats_path"
    mean, istd, fp = load_cmvn_stats(cfg.cmvn_stats_path)
    want = feature_fingerprint(cfg)
    if fp is not None and fp != want:
        raise ValueError(
            f"CMVN stats {cfg.cmvn_stats_path} were computed under a "
            f"different frontend:\n  stats:  {fp}\n  active: {want}\n"
            f"recompute with bin/compute_cmvn.py using the matching "
            f"frontend (--frontend-json)")
    return (feats - jnp.asarray(mean)) * jnp.asarray(istd)


def build_lfr_features(feats: jnp.ndarray, m: int = 4, n: int = 3) -> jnp.ndarray:
    """Low frame rate: stack m consecutive frames, subsample by n.

    Reference: src/data/data.py `build_LFR_features(inputs, m, n)`. [..., T, D]
    -> [..., ceil(T/n), m*D], with right-edge frames clamped to the last frame
    (the reference pads by repeating the final frame).
    """
    t = feats.shape[-2]
    t_out = (t + n - 1) // n
    starts = np.arange(t_out) * n
    idx = np.minimum(starts[:, None] + np.arange(m)[None, :], t - 1)  # [T_out, m]
    stacked = feats[..., idx, :]  # [..., T_out, m, D]
    return stacked.reshape(*stacked.shape[:-2], m * feats.shape[-1])


def lfr_length(t: jnp.ndarray | int, n: int = 3):
    """Valid output length after LFR subsampling by n."""
    return (t + n - 1) // n


def wav_to_features(
    wav: jnp.ndarray,
    wav_lengths: jnp.ndarray,
    cfg: FrontendConfig = FrontendConfig(),
    apply_cmvn: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Padded waveforms [B, S] + lengths [B] -> (feats [B, T, D], frame_lengths [B]).

    The single public entry the data pipeline uses. Frames past
    frame_lengths[b] are zeroed so downstream masking can be sloppy.
    """
    feats = log_mel_spectrogram(wav, cfg)
    num = 1 + jnp.maximum(wav_lengths - cfg.frame_length, 0) // cfg.frame_shift
    frame_lengths = jnp.where(wav_lengths < cfg.frame_length, 0, num)
    if cfg.add_pitch:
        # Kaldi paste-feats order: fbank dims first, then the 3 pitch
        # dims; CMVN below normalizes the pasted feature like apply-cmvn.
        feats = jnp.concatenate(
            [feats, pitch_features(wav, frame_lengths, cfg)], axis=-1)
    if apply_cmvn and cfg.cmvn_mode == "utterance":
        feats = cmvn(feats, frame_lengths)
    elif apply_cmvn and cfg.cmvn_mode == "global":
        feats = apply_global_cmvn(feats, cfg)
    elif apply_cmvn and cfg.cmvn_mode != "none":
        raise ValueError(f"unknown cmvn_mode {cfg.cmvn_mode!r}")
    t = feats.shape[-2]
    mask = (jnp.arange(t)[None, :] < frame_lengths[:, None])[..., None]
    feats = jnp.where(mask, feats, 0.0)
    return feats, frame_lengths
