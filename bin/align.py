#!/usr/bin/env python
"""CTC forced alignment: per-token time spans for reference transcripts.

Production alignment/subtitling tool the reference lacks: given audio (or
features) AND its transcript, the Viterbi best path through the CTC
lattice (ops/ctc.py::ctc_viterbi_align, batched on device) assigns each
reference token a [start, end] frame span, written as JSONL with both
encoder frames and seconds. Works with any checkpoint that has a CTC head
(ctc / hybrid / transducer with aux CTC).

  python bin/align.py --ckpt exp/aishell_hybrid \
      --manifest data/aishell/test.jsonl --output align.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--manifest", required=True,
                   help="JSONL with tokens (the transcripts to align)")
    p.add_argument("--output", default="")
    p.add_argument("--restore", default="best", choices=["best", "latest"])
    p.add_argument("--batch-frames", type=int, default=16000)
    p.add_argument("--num-buckets", type=int, default=4)
    p.add_argument("--platform", default="")
    p.add_argument("--prng-impl", default="rbg")
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
    import functools

    import jax.numpy as jnp
    import numpy as np

    from tpu_asr.data import DataLoader, load_manifest, make_buckets
    from tpu_asr.frontend import FrontendConfig
    from tpu_asr.models import build_model
    from tpu_asr.ops.ctc import ctc_viterbi_align
    from tpu_asr.train import TrainState, make_optimizer
    from tpu_asr.train.checkpoints import Checkpointer
    from tpu_asr.train.loop import apply_lfr, batch_features, \
        strip_host_fields

    ck = Checkpointer(args.ckpt)
    cfg = ck.load_config()
    assert cfg.model_type in ("ctc", "hybrid") or (
        cfg.model_type == "transducer" and cfg.ctc_weight > 0), \
        f"alignment needs a CTC head (model_type={cfg.model_type})"
    frontend = ck.load_frontend() or FrontendConfig()

    utts = load_manifest(args.manifest)
    assert all(u.tokens for u in utts), \
        "--manifest must carry reference tokens to align"
    wav_mode = bool(utts and utts[0].wav)
    scale = frontend.frame_shift if wav_mode else 1
    buckets = make_buckets(
        utts, num_buckets=args.num_buckets,
        batch_frames=args.batch_frames * scale,
        max_frames_cap=3000 * scale, max_tokens_cap=200,
        length_key="num_samples" if wav_mode else "num_frames")
    loader = DataLoader(utts, buckets, mode="wav" if wav_mode else "feat",
                        shuffle=False)

    model = build_model(cfg)
    batch0 = next(iter(loader))
    b0 = {k: jnp.asarray(v) for k, v in strip_host_fields(batch0).items()}
    feats0, flens0 = batch_features(b0, frontend)
    if cfg.input_layer == "linear":
        feats0, flens0 = apply_lfr(feats0, flens0, (cfg.lfr_m, cfg.lfr_n))
    variables = model.init(jax.random.PRNGKey(0), feats0, flens0,
                           b0["targets"], b0["target_lengths"])
    tx = make_optimizer(cfg.d_model)
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(0))
    step = (ck.latest_step() if args.restore == "latest" else ck.best_step())
    state, _ = ck.restore(state, step=step)
    params = {"params": state.params}

    @functools.partial(jax.jit, static_argnums=())
    def align_batch(batch):
        feats, flens = batch_features(batch, frontend)
        if cfg.input_layer == "linear":
            feats, flens = apply_lfr(feats, flens, (cfg.lfr_m, cfg.lfr_n))
        enc_out, el = model.apply(params, feats, flens, method="encode")
        logits = model.apply(params, enc_out, method="ctc_logits")
        safe = jnp.where(batch["targets"] < 0, 0, batch["targets"])
        # host backtrace lives inside ctc_viterbi_align; return its inputs
        return logits, el, safe

    # frame -> seconds: encoder frame stride in input frames x 10 ms
    stride = (cfg.conv_total_stride if cfg.input_layer == "conv2d"
              else cfg.lfr_n)
    sec = stride * frontend.frame_shift_ms / 1000.0

    out_path = args.output or os.path.join(args.ckpt, "align.jsonl")
    n = 0
    with open(out_path, "w") as f:
        for batch in loader:
            arrays = {k: jnp.asarray(v) for k, v in
                      strip_host_fields(batch).items()}
            logits, el, safe = align_batch(arrays)
            starts, ends = ctc_viterbi_align(
                logits, safe, el, arrays["target_lengths"])
            # one grouped fetch per batch (per-array np.asarray costs a
            # full host<->device round trip each — r5)
            starts, ends, tl, tgt = jax.device_get(
                (starts, ends, arrays["target_lengths"],
                 arrays["targets"]))
            for i, uid in enumerate(batch["ids"]):
                if uid is None:
                    continue
                ul = int(tl[i])
                rec = {
                    "id": uid,
                    "tokens": [int(x) for x in tgt[i, :ul]],
                    "start_frames": [int(x) for x in starts[i, :ul]],
                    "end_frames": [int(x) for x in ends[i, :ul]],
                    "start_s": [round(float(x) * sec, 3)
                                for x in starts[i, :ul]],
                    "end_s": [round(float(x + 1) * sec, 3)
                              for x in ends[i, :ul]],
                }
                f.write(json.dumps(rec) + "\n")
                n += 1
    print(json.dumps({"n_utts": n, "output": out_path,
                      "frame_s": sec}))


if __name__ == "__main__":
    main()
