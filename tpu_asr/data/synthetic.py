"""Synthetic learnable ASR dataset (tests, benchmarks, demos).

No AISHELL audio ships with this machine, so integration tests and the
benchmark harness use a synthetic task with the same interface: each token
maps to a distinct tone burst, so waveform -> token-sequence is genuinely
learnable end-to-end through the real frontend + model stack.
"""

from __future__ import annotations

import os

import numpy as np

from tpu_asr.data.manifest import Utterance, save_manifest


def token_wave(token: int, num_tokens: int, dur: int, sr: int,
               rng: np.random.Generator) -> np.ndarray:
    """A tone burst whose frequency encodes the token id."""
    f0 = 200.0 + 3000.0 * (token / max(num_tokens, 1))
    t = np.arange(dur) / sr
    env = np.hanning(dur)
    wave = np.sin(2 * np.pi * f0 * t) + 0.3 * np.sin(2 * np.pi * 2 * f0 * t)
    return (env * wave).astype(np.float32)


def make_synthetic_dataset(
    n_utts: int,
    vocab_size: int,
    min_tokens: int = 3,
    max_tokens: int = 10,
    tone_ms: int = 120,
    sample_rate: int = 16000,
    seed: int = 0,
    out_dir: str | None = None,
):
    """Returns (utterances, waves dict id->float32 wav). Token ids are drawn
    from [2, vocab_size-2) (0=blank, 1=unk, last two sos/eos)."""
    rng = np.random.default_rng(seed)
    dur = int(tone_ms * sample_rate / 1000)
    utts, waves = [], {}
    for i in range(n_utts):
        n = int(rng.integers(min_tokens, max_tokens + 1))
        tokens = rng.integers(2, vocab_size - 2, n).tolist()
        wav = np.concatenate(
            [token_wave(t, vocab_size, dur, sample_rate, rng)
             for t in tokens])
        wav = wav + 0.01 * rng.standard_normal(len(wav)).astype(np.float32)
        uid = f"synth{i:06d}"
        path = None
        if out_dir is not None:
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, uid + ".npy")
            np.save(path, wav)
        utts.append(Utterance(
            id=uid, tokens=tokens, text=" ".join(map(str, tokens)),
            wav=path, num_samples=len(wav)))
        waves[uid] = wav
    return utts, waves


def write_synthetic_manifest(path: str, n_utts: int, vocab_size: int,
                             **kw) -> list[Utterance]:
    out_dir = os.path.join(os.path.dirname(os.path.abspath(path)), "wavs")
    utts, _ = make_synthetic_dataset(n_utts, vocab_size, out_dir=out_dir,
                                     **kw)
    save_manifest(utts, path)
    return utts
