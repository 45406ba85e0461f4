#!/usr/bin/env python
"""Training CLI.

Reference: src/bin/train.py (argparse -> dataset/model/solver ->
Solver.train()). Here: preset + overrides -> bucketed loaders -> jitted
train loop with orbax checkpoints and JSONL metrics.

Examples:
  python bin/train.py --preset hybrid --train-manifest train.jsonl \
      --cv-manifest dev.jsonl --save-folder exp/hybrid --vocab-size 4233
  python bin/train.py --preset ctc_dev --synthetic 200 --save-folder exp/dev
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="hybrid")
    p.add_argument("--train-manifest")
    p.add_argument("--cv-manifest")
    p.add_argument("--save-folder", required=True)
    p.add_argument("--vocab-size", type=int, default=0)
    p.add_argument("--dict", dest="dict_path",
                   help="token dict file (sets vocab size)")
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--batch-frames", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=0,
                   help="fixed utterances per batch (reference --batch_size mode; overrides the batch-frames budget)")
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--accum-steps", type=int, default=0,
                   help="gradient accumulation: apply the optimizer every "
                        "k-th batch on averaged grads (simulates a k-times "
                        "larger batch at flat memory)")
    p.add_argument("--lr-k", type=float, default=0.0)
    p.add_argument("--continue-from", dest="continue_from")
    p.add_argument("--num-devices", type=int, default=0,
                   help="data-parallel devices (0 = all)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic utterances (demo/smoke)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--print-freq", type=int, default=0)
    p.add_argument("--platform", default="",
                   help="force jax platform (e.g. cpu) — overrides plugins")
    p.add_argument("--profile-dir", default="",
                   help="write a jax.profiler trace of steps 10-15")
    p.add_argument("--debug-nans", action="store_true")
    p.add_argument("--enc-chunk-size", type=int, default=-1,
                   help="post-subsample frames per encoder chunk "
                        "(chunk-masked streaming training; preset default "
                        "if unset, 0 = full context)")
    p.add_argument("--enc-left-chunks", type=int, default=-2,
                   help="bounded left context in chunks (-1 = unlimited)")
    p.add_argument("--dtype", default="", choices=["", "bf16", "f32"],
                   help="override the preset's activation dtype")
    p.add_argument("--pallas-ctc", type=int, default=-1, choices=[-1, 0, 1],
                   help="override the preset's Pallas-CTC-loss switch")
    p.add_argument("--no-specaug", action="store_true",
                   help="disable SpecAugment even if the preset enables "
                        "it (e.g. narrowband/synthetic data where "
                        "frequency masks remove the class signal)")
    p.add_argument("--specaug-warp", type=int, default=-1,
                   help="SpecAugment time-warp window W (0 = masking only, "
                        "the reference behavior; -1 = preset default)")
    p.add_argument("--cmvn", default="",
                   choices=["", "utterance", "global", "none"],
                   help="feature normalization: per-utterance (default), "
                        "global train-set stats (--cmvn-stats, the causal "
                        "choice for streaming), or none")
    p.add_argument("--cmvn-stats", default="",
                   help=".npz from bin/compute_cmvn.py (with --cmvn global)")
    p.add_argument("--pitch", action="store_true",
                   help="append 3 Kaldi-style pitch dims (POV, normalized "
                        "log-pitch, delta-pitch) to the fbank — the "
                        "reference recipe family's fbank+pitch features "
                        "(wav-mode/on-device frontend only)")
    p.add_argument("--prng-impl", default="rbg",
                   help="PRNG for dropout/specaug; rbg is ~1.5x faster "
                        "train steps on TPU than threefry")
    from tpu_asr.utils.compile_cache import add_cache_flag
    add_cache_flag(p)
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.prng_impl:
        jax.config.update("jax_default_prng_impl", args.prng_impl)
    from tpu_asr.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(args.compile_cache)
    if os.environ.get("COORDINATOR_ADDRESS"):
        # multi-host (DCN) launch: every process runs this same CLI with
        # COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID set; must run
        # before the first device query (tests/integration/test_multihost.py
        # drives the same path with two local processes)
        from tpu_asr.parallel.mesh import initialize_distributed
        initialize_distributed()
    from tpu_asr.configs import get_preset
    from tpu_asr.data import DataLoader, load_manifest, make_buckets
    from tpu_asr.models import build_model
    from tpu_asr.parallel import make_mesh
    from tpu_asr.train import Solver, TrainState, make_optimizer
    from tpu_asr.train.checkpoints import Checkpointer
    from tpu_asr.train.metrics import MetricsWriter
    from tpu_asr.utils.vocab import Vocab

    tc = get_preset(args.preset)
    vocab_size = tc.model.vocab_size
    if args.dict_path:
        vocab_size = len(Vocab.load(args.dict_path))
    if args.vocab_size:
        vocab_size = args.vocab_size

    overrides = {"vocab_size": vocab_size}
    if args.enc_chunk_size >= 0:
        overrides["enc_chunk_size"] = args.enc_chunk_size
    if args.enc_left_chunks >= -1:
        overrides["enc_left_chunks"] = args.enc_left_chunks
    if args.dtype:
        import jax.numpy as jnp
        overrides["dtype"] = {"bf16": jnp.bfloat16,
                              "f32": jnp.float32}[args.dtype]
    if args.pallas_ctc in (0, 1):
        overrides["pallas_ctc"] = bool(args.pallas_ctc)
    mc = dataclasses.replace(tc.model, **overrides)
    if args.epochs:
        tc = dataclasses.replace(tc, epochs=args.epochs)
    if args.batch_frames:
        tc = dataclasses.replace(tc, batch_frames=args.batch_frames)
    if args.batch_size:
        tc = dataclasses.replace(tc, batch_size=args.batch_size)
    if args.warmup_steps:
        tc = dataclasses.replace(tc, warmup_steps=args.warmup_steps)
    if args.accum_steps:
        tc = dataclasses.replace(tc, accum_steps=args.accum_steps)
    if args.lr_k:
        tc = dataclasses.replace(tc, lr_k=args.lr_k)
    if args.print_freq:
        tc = dataclasses.replace(tc, print_freq=args.print_freq)
    if args.no_specaug:
        tc = dataclasses.replace(tc, specaug=None)
    if args.specaug_warp >= 0 and tc.specaug is not None:
        tc = dataclasses.replace(tc, specaug=dataclasses.replace(
            tc.specaug, time_warp_window=args.specaug_warp))
    if args.cmvn:
        assert args.cmvn != "global" or args.cmvn_stats, \
            "--cmvn global needs --cmvn-stats"
        tc = dataclasses.replace(tc, frontend=dataclasses.replace(
            tc.frontend, cmvn_mode=args.cmvn,
            cmvn_stats_path=os.path.abspath(args.cmvn_stats)
            if args.cmvn_stats else ""))
    if args.pitch:
        # Kaldi "fbank+pitch": 3 pitch dims pasted onto the fbank
        # (reference recipe family's feature-extraction stage).
        tc = dataclasses.replace(tc, frontend=dataclasses.replace(
            tc.frontend, add_pitch=True))

    if args.synthetic:
        from tpu_asr.data.synthetic import make_synthetic_dataset
        if not args.vocab_size and not args.dict_path:
            vocab_size = 64
            mc = dataclasses.replace(mc, vocab_size=vocab_size)
        utts, waves = make_synthetic_dataset(args.synthetic, vocab_size,
                                             seed=tc.seed)
        n_cv = max(args.synthetic // 10, 1)
        train_utts, cv_utts = utts[n_cv:], utts[:n_cv]
        mode, waves_arg = "wav", waves
        length_key = "num_samples"
        sample_cap = tc.max_frames_cap * tc.frontend.frame_shift
        batch_budget = tc.batch_frames * tc.frontend.frame_shift
    else:
        assert args.train_manifest and args.cv_manifest, \
            "--train-manifest/--cv-manifest (or --synthetic) required"
        train_utts = load_manifest(args.train_manifest)
        cv_utts = load_manifest(args.cv_manifest)
        wav_mode = bool(train_utts and train_utts[0].wav)
        mode = "wav" if wav_mode else "feat"
        waves_arg = None
        length_key = "num_samples" if wav_mode else "num_frames"
        scale = tc.frontend.frame_shift if wav_mode else 1
        sample_cap = tc.max_frames_cap * scale
        batch_budget = tc.batch_frames * scale

    if mode == "wav" and mc.d_input != tc.frontend.feature_dim:
        # keep the config's metadata dim honest when the on-device
        # frontend decides the feature dim (e.g. add_pitch -> mels+3):
        # streaming buffers, serve validation, and torch export read it
        # (the flax modules themselves infer dims from the init batch)
        mc = dataclasses.replace(mc, d_input=tc.frontend.feature_dim)

    n_dev = args.num_devices or len(jax.devices())
    buckets = make_buckets(
        train_utts, num_buckets=tc.num_buckets, batch_frames=batch_budget,
        max_frames_cap=sample_cap, max_tokens_cap=tc.max_tokens_cap,
        batch_multiple=n_dev, length_key=length_key,
        batch_size=tc.batch_size)
    print(f"buckets: {buckets}", file=sys.stderr)
    train_loader = DataLoader(train_utts, buckets, mode=mode,
                              waves=waves_arg, seed=tc.seed)
    cv_loader = DataLoader(cv_utts, buckets, mode=mode, waves=waves_arg,
                           shuffle=False)

    model = build_model(mc)
    tx = make_optimizer(mc.d_model, tc.warmup_steps, tc.lr_k, tc.grad_clip,
                        accum_steps=tc.accum_steps)

    # init from one batch's shapes
    batch0 = next(iter(cv_loader if cv_utts else train_loader))
    from tpu_asr.train.loop import apply_lfr, batch_features, strip_host_fields
    import jax.numpy as jnp
    b0 = {k: jnp.asarray(v) for k, v in strip_host_fields(batch0).items()}
    feats, flens = batch_features(b0, tc.frontend)
    if mc.input_layer == "linear":
        feats, flens = apply_lfr(feats, flens, (mc.lfr_m, mc.lfr_n))
    variables = model.init(jax.random.PRNGKey(tc.seed), feats, flens,
                           b0["targets"], b0["target_lengths"])
    state = TrainState.create(variables["params"], tx,
                              jax.random.PRNGKey(tc.seed + 1))
    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(state.params))
    print(f"model: {mc.model_type}, {n_params/1e6:.1f}M params",
          file=sys.stderr)

    ck = Checkpointer(args.save_folder)
    ck.save_config(mc)
    ck.save_frontend(tc.frontend)
    start_epoch = 0
    if args.continue_from:
        prev = Checkpointer(args.continue_from)
        state, meta = prev.restore(state)
        start_epoch = meta["epoch"] + 1
        print(f"resumed from step {int(state.step)} (epoch {start_epoch})",
              file=sys.stderr)

    mesh = make_mesh(n_data=n_dev) if n_dev > 1 else None

    lfr = ((mc.lfr_m, mc.lfr_n) if mc.input_layer == "linear" else (1, 1))
    solver = Solver(
        model=model, tx=tx, train_loader=train_loader, cv_loader=cv_loader,
        epochs=tc.epochs, print_freq=tc.print_freq, specaug=tc.specaug,
        frontend=tc.frontend, lfr=lfr, mesh=mesh, checkpointer=ck,
        metrics_writer=(MetricsWriter(
            os.path.join(args.save_folder, "metrics.jsonl"))
            if jax.process_index() == 0 else None),
        start_epoch=start_epoch,
        profile_dir=args.profile_dir or None)
    state = solver.train(state)
    ck.wait()
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
