#!/usr/bin/env python
"""Compute global CMVN statistics over a (train) manifest.

The reference recipe's `compute-cmvn-stats` / `apply-cmvn` stage
(egs/aishell/run.sh, Kaldi C++): accumulate per-dimension mean/variance of
the log-mel features over the whole training set, then normalize every
split with those TRAIN stats. Per-utterance CMVN (this repo's default) is
fine offline but non-causal — global stats are the right choice for
streaming (decode/streaming.py) and serving.

Writes an .npz with mean [D], istd [D], frames (count). Use it via
  python bin/train.py ... --cmvn global --cmvn-stats exp/cmvn.npz
(decode CLIs pick the mode up from the checkpoint's frontend sidecar).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", required=True)
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--frontend-json", default="",
                   help="frontend.json sidecar (or a checkpoint dir "
                        "containing one) describing the frontend the "
                        "stats are for; defaults to FrontendConfig() "
                        "defaults. The frontend fingerprint is stored in "
                        "the .npz and validated at apply time.")
    p.add_argument("--limit", type=int, default=0,
                   help="max utterances (0 = all)")
    p.add_argument("--platform", default="",
                   help="force jax platform (e.g. cpu)")
    from tpu_asr.utils.compile_cache import add_cache_flag
    add_cache_flag(p)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from tpu_asr.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(args.compile_cache)
    import jax.numpy as jnp
    import numpy as np

    from tpu_asr.data import load_manifest
    from tpu_asr.frontend import (FrontendConfig, feature_fingerprint,
                                  wav_to_features)

    utts = load_manifest(args.manifest)
    if args.limit:
        utts = utts[: args.limit]
    fcfg = FrontendConfig()
    if args.frontend_json:
        import dataclasses
        import json
        path = args.frontend_json
        if os.path.isdir(path):
            path = os.path.join(path, "frontend.json")
        with open(path) as f:
            d = json.load(f)
        d["dtype"] = jnp.dtype(d["dtype"])
        # CMVN policy fields describe how stats are APPLIED, not what the
        # features are; accumulation always runs un-normalized.
        fcfg = dataclasses.replace(
            FrontendConfig(**d), cmvn_mode="none", cmvn_stats_path="")
    total = None
    total_sq = None
    n_frames = 0
    for utt in utts:
        if utt.wav:
            from tpu_asr.data.audio import read_wav
            wav = (np.load(utt.wav) if utt.wav.endswith(".npy")
                   else read_wav(utt.wav))
            f, fl = wav_to_features(jnp.asarray(wav[None]),
                                    jnp.asarray([len(wav)]), fcfg,
                                    apply_cmvn=False)
            feats = np.asarray(f[0, : int(fl[0])], np.float64)
        else:
            from tpu_asr.data.kaldi_io import read_mat
            feats = np.asarray(read_mat(utt.feat), np.float64)
        if total is None:
            total = np.zeros(feats.shape[1])
            total_sq = np.zeros(feats.shape[1])
        total += feats.sum(axis=0)
        total_sq += np.square(feats).sum(axis=0)
        n_frames += feats.shape[0]
    assert n_frames > 0, "no frames accumulated"
    mean = total / n_frames
    var = np.maximum(total_sq / n_frames - np.square(mean), 1e-8)
    istd = 1.0 / np.sqrt(var)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, mean=mean.astype(np.float32),
             istd=istd.astype(np.float32), frames=np.int64(n_frames),
             fingerprint=np.str_(feature_fingerprint(fcfg)))
    print(f"wrote {args.out}: {n_frames} frames, "
          f"mean[0]={mean[0]:.3f} istd[0]={istd[0]:.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
