#!/usr/bin/env python
"""Decoding CLI.

Reference: src/bin/recognize.py (load checkpoint -> per-utt recognize_beam
-> add_results_to_json). Here: checkpoint dir -> batched jit-compiled
decode over bucketed batches -> hypothesis JSONL (+ CER when references are
present in the manifest).

Example:
  python bin/recognize.py --ckpt exp/hybrid --manifest test.jsonl \
      --mode joint --beam 10 --output hyp.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default="", help="checkpoint dir")
    p.add_argument("--torch-ckpt", default="",
                   help="decode a reference-style torch .pth.tar checkpoint "
                        "(weights imported via tpu_asr.parity.torch_import); "
                        "model hyperparams come from the checkpoint or from "
                        "--ckpt's config sidecar when both are given")
    p.add_argument("--manifest", required=True)
    p.add_argument("--output", default="")
    p.add_argument("--mode", default="",
                   choices=["", "greedy_ctc", "ctc_beam", "beam", "joint",
                            "attn_rescore", "cif_greedy", "cif_beam",
                            "transducer_greedy", "transducer_beam",
                            "transducer_rescore"])
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--nbest", type=int, default=1)
    p.add_argument("--max-len", type=int, default=100)
    p.add_argument("--maxlenratio", type=float, default=0.0,
                   help="per-utterance max decode length = ratio * encoder "
                        "length (reference recognize_beam semantics); 0 = "
                        "static --max-len only")
    p.add_argument("--minlenratio", type=float, default=0.0,
                   help="ban eos before ratio * encoder length tokens")
    p.add_argument("--length-penalty", type=float, default=0.0,
                   help="per-token reward added to final beam scores "
                        "(counteracts short-hypothesis bias, e.g. RNN-T "
                        "beam deletion bias)")
    p.add_argument("--ctc-weight", type=float, default=0.3)
    p.add_argument("--lm-ckpt", default="",
                   help="external LM checkpoint dir (bin/train_lm.py) for "
                        "shallow fusion (beam/joint) or n-best rescoring "
                        "(attn_rescore)")
    p.add_argument("--lm-weight", type=float, default=0.3,
                   help="LM score weight (only with --lm-ckpt)")
    p.add_argument("--batch-frames", type=int, default=16000)
    p.add_argument("--num-buckets", type=int, default=4)
    p.add_argument("--step", type=int, default=-1,
                   help="checkpoint step (-1 = use --restore policy)")
    p.add_argument("--restore", default="best", choices=["best", "latest"],
                   help="which checkpoint when --step is -1 (reference "
                        "decodes final.pth.tar or the best-cv copy)")
    p.add_argument("--platform", default="",
                   help="force jax platform (e.g. cpu) — overrides plugins")
    p.add_argument("--cif-fire", default="scaled",
                   choices=["scaled", "raw"],
                   help="CIF inference firing: 'scaled' self-scales alphas "
                        "to the rounded fire count; 'raw' is the "
                        "reference's unscaled firing (matches streaming)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel decode over N devices (a 'data'-axis "
                        "jax.sharding.Mesh; batches shard along the batch "
                        "axis, params replicate, XLA GSPMD partitions every "
                        "decode mode). 0 = single device")
    p.add_argument("--prng-impl", default="rbg",
                   help="must match training (the checkpointed TrainState "
                        "rng key shape depends on it; train default: rbg)")
    from tpu_asr.utils.compile_cache import add_cache_flag
    add_cache_flag(p)
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.prng_impl:
        jax.config.update("jax_default_prng_impl", args.prng_impl)
    from tpu_asr.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(args.compile_cache)
    from tpu_asr.data import DataLoader, load_manifest, make_buckets
    from tpu_asr.decode.beam import BeamConfig
    from tpu_asr.decode.recognizer import Recognizer
    from tpu_asr.frontend import FrontendConfig
    from tpu_asr.models import build_model
    from tpu_asr.train import TrainState, make_optimizer
    from tpu_asr.train.checkpoints import Checkpointer
    from tpu_asr.utils.cer import cer

    assert args.ckpt or args.torch_ckpt, "--ckpt or --torch-ckpt required"
    torch_params = None
    if args.torch_ckpt:
        from tpu_asr.parity.torch_import import load_torch_checkpoint
        sidecar_cfg = Checkpointer(args.ckpt).load_config() \
            if args.ckpt else None
        torch_params, cfg = load_torch_checkpoint(args.torch_ckpt,
                                                  sidecar_cfg)
    else:
        ck = Checkpointer(args.ckpt)
        cfg = ck.load_config()
    mode = args.mode or {
        "ctc": "greedy_ctc", "transformer": "beam", "hybrid": "joint",
        "cif": "cif_greedy", "transducer": "transducer_greedy"}[cfg.model_type]
    if mode == "joint" and cfg.model_type != "hybrid":
        mode = "beam"

    utts = load_manifest(args.manifest)
    wav_mode = bool(utts and utts[0].wav)
    frontend = FrontendConfig()
    if args.ckpt:
        fc = Checkpointer(args.ckpt).load_frontend()
        if fc is not None:
            frontend = fc    # train-time feature policy (CMVN mode/stats)
    scale = frontend.frame_shift if wav_mode else 1
    mesh = None
    if args.dp > 1:
        from tpu_asr.parallel import make_mesh
        assert len(jax.devices()) >= args.dp, \
            f"--dp {args.dp} > {len(jax.devices())} visible devices"
        mesh = make_mesh(n_data=args.dp, n_model=1,
                         devices=jax.devices()[: args.dp])
    buckets = make_buckets(
        utts, num_buckets=args.num_buckets,
        batch_frames=args.batch_frames * scale,
        max_frames_cap=3000 * scale, max_tokens_cap=200,
        batch_multiple=max(args.dp, 1),
        length_key="num_samples" if wav_mode else "num_frames")
    loader = DataLoader(utts, buckets, mode="wav" if wav_mode else "feat",
                        shuffle=False)

    # restore params
    model = build_model(cfg)
    batch0 = next(iter(loader))
    import jax.numpy as jnp
    from tpu_asr.train.loop import (apply_lfr, batch_features,
                                    strip_host_fields)
    b0 = {k: jnp.asarray(v) for k, v in strip_host_fields(batch0).items()}
    feats, flens = batch_features(b0, frontend)
    if cfg.input_layer == "linear":
        feats, flens = apply_lfr(feats, flens, (cfg.lfr_m, cfg.lfr_n))
    if torch_params is not None:
        params = torch_params
    else:
        variables = model.init(jax.random.PRNGKey(0), feats, flens,
                               b0["targets"], b0["target_lengths"])
        tx = make_optimizer(cfg.d_model)
        state = TrainState.create(variables["params"], tx,
                                  jax.random.PRNGKey(0))
        if args.step >= 0:
            step = args.step
        elif args.restore == "latest":
            step = ck.latest_step()
        else:
            step = ck.best_step()
        state, _ = ck.restore(state, step=step)
        params = {"params": state.params}

    lm_cfg = lm_params = None
    if args.lm_ckpt:
        from tpu_asr.models.lm import TransformerLM, load_lm_config
        lm_cfg = load_lm_config(args.lm_ckpt)
        lm_model = TransformerLM(lm_cfg)
        lv = lm_model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2), jnp.int32))
        lm_state = TrainState.create(lv["params"],
                                     make_optimizer(lm_cfg.d_model),
                                     jax.random.PRNGKey(0))
        lck = Checkpointer(args.lm_ckpt)
        lm_state, _ = lck.restore(lm_state, step=lck.best_step())
        lm_params = {"params": lm_state.params}

    rec = Recognizer(cfg=cfg, params=params,
                     beam=BeamConfig(beam=args.beam, max_len=args.max_len,
                                     nbest=args.nbest,
                                     maxlenratio=args.maxlenratio,
                                     minlenratio=args.minlenratio,
                                     length_penalty=args.length_penalty,
                                     ctc_weight=args.ctc_weight
                                     if mode in ("joint", "attn_rescore",
                                                 "transducer_rescore")
                                     else 0.0,
                                     lm_weight=args.lm_weight
                                     if args.lm_ckpt else 0.0),
                     mode=mode, frontend=frontend,
                     cif_scale_fire=(args.cif_fire == "scaled"),
                     lm_cfg=lm_cfg, lm_params=lm_params, mesh=mesh)

    # warm up EVERY bucket shape so no compile lands in the timed loop
    warmed = set()
    for batch in DataLoader(utts, buckets,
                            mode="wav" if wav_mode else "feat",
                            shuffle=False):
        key = (batch["wav"] if wav_mode else batch["feats"]).shape
        if key not in warmed:
            rec.decode_batch_nbest(batch)
            warmed.add(key)

    results = {}
    total_audio_s = 0.0
    t_start = time.time()
    loader.epoch = 0
    # pipelined decode: dispatch a window of batches of device work ahead
    # and group the output fetches — one host<->device round trip per
    # window instead of per output array (r5: the round trip is ~23 ms
    # over the axon tunnel and dominated decode wall time before this).
    # The loader streams; per-batch ids/audio metadata is collected as
    # batches are consumed so host memory stays one window deep.
    batch_ids = []

    def stream():
        nonlocal total_audio_s
        for batch in DataLoader(utts, buckets,
                                mode="wav" if wav_mode else "feat",
                                shuffle=False):
            batch_ids.append(batch["ids"])
            if wav_mode:
                total_audio_s += float(np.sum(batch["wav_lengths"])) / \
                    frontend.sample_rate
            else:
                total_audio_s += float(np.sum(batch["feat_lengths"])) * \
                    frontend.frame_shift_ms / 1000.0
            yield batch

    for ids, nbests in zip(batch_ids, rec.decode_batches_nbest(stream())):
        for uid, nb in zip(ids, nbests):
            results[uid] = nb
    wall = time.time() - t_start
    inv_rtf = total_audio_s / wall if wall > 0 else 0.0

    refs = {u.id: u.tokens for u in utts}
    have_refs = any(refs.values())
    out_dir = args.ckpt or os.path.dirname(args.torch_ckpt) or "."
    out_path = args.output or os.path.join(out_dir, "hyp.jsonl")
    with open(out_path, "w") as f:
        for uid, nb in results.items():
            rec_out = {"id": uid, "hyp_tokens": nb[0]["yseq"]}
            if "times" in nb[0]:
                # emission encoder-frame per token (x subsample stride
                # x 10 ms for seconds) — greedy CTC / transducer modes
                rec_out["times"] = nb[0]["times"]
            if "confidence" in nb[0]:
                rec_out["confidence"] = nb[0]["confidence"]
            if len(nb) > 1:
                rec_out["nbest"] = nb
            f.write(json.dumps(rec_out) + "\n")
    summary = {"n_utts": len(results), "inverse_rtf": round(inv_rtf, 2),
               "wall_s": round(wall, 2), "mode": mode}
    if have_refs:
        score = cer([refs[u] for u in results],
                    [nb[0]["yseq"] for nb in results.values()])
        summary["cer"] = round(score["cer"], 4)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
