#!/usr/bin/env python
"""Streaming decode demo: feed utterances chunk-by-chunk, print tokens as
they become final.

Beyond-the-reference capability (src/bin/recognize.py is offline-only):
drives tpu_asr.decode.streaming.StreamingCTCRecognizer over a manifest,
simulating real-time feature arrival, and reports per-utterance incremental
hypotheses, CER (when references exist), and emission lag (how many frames
behind the audio front each token was emitted — bounded by the model's
enc_chunk_size).

  python bin/stream_demo.py --ckpt exp/streaming --manifest test.jsonl \
      --chunk-frames 64 --platform cpu

Features are extracted offline (wav mode uses the per-utterance-CMVN
frontend; a production deployment would stream global-CMVN features) and
then replayed incrementally — the model path is exactly causal.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="checkpoint dir")
    p.add_argument("--manifest", required=True)
    p.add_argument("--chunk-frames", type=int, default=64,
                   help="feature frames fed per push (64 = 0.64 s)")
    p.add_argument("--beam", type=int, default=1,
                   help="beam > 1 runs streaming CTC prefix beam search "
                        "(chunked ctc/hybrid models; 1-best may be "
                        "revised as audio arrives)")
    p.add_argument("--max-frames", type=int, default=3000)
    p.add_argument("--restore", default="best", choices=["best", "latest"],
                   help="which checkpoint to stream with")
    p.add_argument("--limit", type=int, default=0, help="max utterances")
    p.add_argument("--quiet", action="store_true",
                   help="summary only, no per-push prints")
    p.add_argument("--platform", default="",
                   help="force jax platform (e.g. cpu) — overrides plugins")
    p.add_argument("--prng-impl", default="rbg",
                   help="must match training (checkpointed rng key shape; "
                        "train default: rbg)")
    from tpu_asr.utils.compile_cache import add_cache_flag
    add_cache_flag(p)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.prng_impl:
        jax.config.update("jax_default_prng_impl", args.prng_impl)
    from tpu_asr.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(args.compile_cache)
    import jax.numpy as jnp

    from tpu_asr.data import load_manifest
    from tpu_asr.decode.streaming import (StreamingCIFRecognizer,
                                          StreamingCTCBeamRecognizer,
                                          StreamingCTCRecognizer,
                                          StreamingTransducerRecognizer)
    from tpu_asr.frontend import FrontendConfig, wav_to_features
    from tpu_asr.train import TrainState, make_optimizer
    from tpu_asr.train.checkpoints import Checkpointer
    from tpu_asr.utils.cer import cer

    ck = Checkpointer(args.ckpt)
    cfg = ck.load_config()
    if cfg.enc_chunk_size <= 0:
        print("note: full-context model (enc_chunk_size=0) — tokens only "
              "appear at end-of-stream; train with --enc-chunk-size for "
              "real streaming", file=sys.stderr)
    is_cif = cfg.model_type == "cif"
    is_transducer = cfg.model_type == "transducer"

    utts = load_manifest(args.manifest)
    if args.limit:
        utts = utts[: args.limit]

    # restore params (recognize.py pattern)
    from tpu_asr.models import build_model
    model = build_model(cfg)
    dummy_t = 80
    feats0 = jnp.zeros((1, dummy_t, cfg.d_input), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats0,
                           jnp.full((1,), dummy_t, jnp.int32),
                           jnp.zeros((1, 4), jnp.int32),
                           jnp.full((1,), 4, jnp.int32))
    tx = make_optimizer(cfg.d_model)
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(0))
    step = (ck.latest_step() if args.restore == "latest"
            else ck.best_step())
    state, _ = ck.restore(state, step=step)
    params = {"params": state.params}

    fcfg = ck.load_frontend() or FrontendConfig()
    if fcfg.cmvn_mode == "utterance" and cfg.enc_chunk_size > 0:
        print("note: per-utterance CMVN is non-causal; train with "
              "--cmvn global (bin/compute_cmvn.py) for true streaming",
              file=sys.stderr)
    if fcfg.add_pitch and cfg.enc_chunk_size > 0:
        print("note: pitch normalization is utterance-level (non-causal); "
              "this demo computes features offline — train without --pitch "
              "for true streaming", file=sys.stderr)
    total_err, total_ref, lags = 0, 0, []
    t_wall, n_decoded = 0.0, 0
    for utt in utts:
        if utt.wav:
            from tpu_asr.data.audio import read_wav
            wav = (np.load(utt.wav) if utt.wav.endswith(".npy")
                   else read_wav(utt.wav))
            feats, flen = wav_to_features(
                jnp.asarray(wav[None]), jnp.asarray([len(wav)]), fcfg)
            feats = np.asarray(feats[0, : int(flen[0])])
        else:
            from tpu_asr.data.kaldi_io import read_mat
            feats = np.asarray(read_mat(utt.feat))
        if len(feats) > args.max_frames:
            print(f"warning: {utt.id} is {len(feats)} frames "
                  f"(> --max-frames {args.max_frames}); skipping",
                  file=sys.stderr)
            continue
        if is_transducer:
            rec = StreamingTransducerRecognizer(cfg, params,
                                                max_frames=args.max_frames)
        elif is_cif:
            rec = StreamingCIFRecognizer(cfg, params,
                                         max_frames=args.max_frames)
        elif args.beam > 1:
            rec = StreamingCTCBeamRecognizer(cfg, params, beam=args.beam,
                                             max_frames=args.max_frames)
        else:
            rec = StreamingCTCRecognizer(cfg, params,
                                         max_frames=args.max_frames)
        beam_mode = args.beam > 1 and not is_cif and not is_transducer
        hyp_parts = []
        t0 = time.time()
        prev_best = []
        for pos in range(0, len(feats), args.chunk_frames):
            new = rec.push(feats[pos: pos + args.chunk_frames])
            if beam_mode:
                new, prev_best = ([] if new == prev_best else new), new
            if new:
                # emission lag: audio front minus last final enc frame,
                # in input frames (10 ms each)
                done_enc = getattr(
                    rec, "_emitted_enc",
                    getattr(rec, "_alpha_done", None))
                if done_enc is None and is_transducer:
                    done_enc = rec._chunks_done * cfg.enc_chunk_size
                if done_enc is None:   # beam mode: chunks advanced
                    done_enc = rec._chunks_done * cfg.enc_chunk_size
                lags.append(min(pos + args.chunk_frames, len(feats))
                            - done_enc * 4)
                hyp_parts.append((pos + args.chunk_frames, new))
                if not args.quiet:
                    tag = "=" if beam_mode else "+"
                    print(f"  [{(pos + args.chunk_frames) / 100:6.2f}s] "
                          f"{tag}{new}")
        hyp = rec.finish()
        t_wall += time.time() - t0
        n_decoded += 1
        line = {"id": utt.id, "tokens": hyp}
        if utt.tokens:
            e = cer([utt.tokens], [hyp])
            total_err += e["distance"]
            total_ref += e["ref_len"]
            line["cer"] = round(e["distance"] / max(e["ref_len"], 1), 4)
        print(json.dumps(line))
    summary = {
        "n_utts": n_decoded,
        "chunk_frames": args.chunk_frames,
        "enc_chunk_size": cfg.enc_chunk_size,
        "mean_emission_lag_ms": (round(float(np.mean(lags)) * 10, 1)
                                 if lags else None),
        "wall_s": round(t_wall, 2),
    }
    if total_ref:
        summary["cer"] = round(total_err / total_ref, 4)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
