#!/usr/bin/env python
"""Language-model training CLI (beyond the reference).

Trains the character-level TransformerLM (tpu_asr/models/lm.py) on the
token transcripts of ordinary ASR manifests, for shallow fusion and
n-best rescoring in bin/recognize.py (--lm-ckpt / --lm-weight). The
reference has no external LM; its espnet lineage standardly trains one
on the training transcripts (+ any extra text) exactly like this.

TPU-first shape discipline: one static [batch_size, U_max] program — the
whole corpus pads to a single width, partial batches pad with dummy rows
(IGNORE_ID targets contribute zero loss), so the jit cache holds exactly
one train and one eval executable.

Example:
  python bin/train_lm.py --train-manifest train.jsonl --cv-manifest \
      dev.jsonl --vocab-size 4233 --save-folder exp/lm --epochs 20
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-manifest")
    p.add_argument("--cv-manifest")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic transcripts (demo/smoke)")
    p.add_argument("--save-folder", required=True)
    p.add_argument("--vocab-size", type=int, default=0)
    p.add_argument("--dict", dest="dict_path")
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--d-inner", type=int, default=1024)
    p.add_argument("--num-heads", type=int, default=4)
    p.add_argument("--num-layers", type=int, default=4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--label-smoothing", type=float, default=0.0)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--warmup-steps", type=int, default=1000)
    p.add_argument("--lr-k", type=float, default=0.5)
    p.add_argument("--grad-clip", type=float, default=5.0)
    p.add_argument("--continue-from", dest="continue_from")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default="",
                   help="force jax platform (e.g. cpu) — overrides plugins")
    p.add_argument("--prng-impl", default="rbg")
    from tpu_asr.utils.compile_cache import add_cache_flag
    add_cache_flag(p)
    return p.parse_args()


def load_token_corpus(args, vocab_size):
    """-> (train token lists, cv token lists, vocab_size)."""
    if args.synthetic:
        from tpu_asr.data.synthetic import make_synthetic_dataset
        vocab_size = vocab_size or 64
        utts, _ = make_synthetic_dataset(args.synthetic, vocab_size,
                                         seed=args.seed)
        n_cv = max(args.synthetic // 10, 1)
        return ([u.tokens for u in utts[n_cv:]],
                [u.tokens for u in utts[:n_cv]], vocab_size)
    from tpu_asr.data import load_manifest
    assert args.train_manifest and args.cv_manifest, \
        "--train-manifest/--cv-manifest (or --synthetic) required"
    tr = [u.tokens for u in load_manifest(args.train_manifest)]
    cv = [u.tokens for u in load_manifest(args.cv_manifest)]
    assert vocab_size, "--vocab-size or --dict required"
    return tr, cv, vocab_size


def make_batches(seqs, batch_size, u_max, sos, eos, ignore_id, rng=None):
    """Token lists -> list of (ys_in [B, U_max+1], targets [B, U_max+1])
    numpy batches. Sequence i contributes P(y_1..y_U, eos | sos)."""
    import numpy as np
    order = np.arange(len(seqs))
    if rng is not None:
        rng.shuffle(order)
    batches = []
    for lo in range(0, len(seqs), batch_size):
        idx = order[lo : lo + batch_size]
        ys_in = np.full((batch_size, u_max + 1), eos, np.int32)
        tgt = np.full((batch_size, u_max + 1), ignore_id, np.int32)
        for r, i in enumerate(idx):
            toks = seqs[i][: u_max]
            ys_in[r, 0] = sos
            ys_in[r, 1 : 1 + len(toks)] = toks
            tgt[r, : len(toks)] = toks
            tgt[r, len(toks)] = eos
        batches.append((ys_in, tgt))
    return batches


def main():
    args = parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.prng_impl:
        jax.config.update("jax_default_prng_impl", args.prng_impl)
    from tpu_asr.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(args.compile_cache)

    import jax.numpy as jnp
    import numpy as np
    import optax
    from tpu_asr import IGNORE_ID
    from tpu_asr.models.lm import LMConfig, TransformerLM, save_lm_config
    from tpu_asr.ops.losses import label_smoothing_loss
    from tpu_asr.train import TrainState, make_optimizer
    from tpu_asr.train.checkpoints import Checkpointer
    from tpu_asr.train.metrics import MetricsWriter
    from tpu_asr.utils.vocab import Vocab

    vocab_size = 0
    if args.dict_path:
        vocab_size = len(Vocab.load(args.dict_path))
    if args.vocab_size:
        vocab_size = args.vocab_size

    train_seqs, cv_seqs, vocab_size = load_token_corpus(args, vocab_size)
    sos, eos = vocab_size - 2, vocab_size - 1
    u_max = max(len(s) for s in train_seqs + cv_seqs)

    cfg = LMConfig(vocab_size=vocab_size, d_model=args.d_model,
                   d_inner=args.d_inner, num_heads=args.num_heads,
                   num_layers=args.num_layers, dropout=args.dropout)
    lm = TransformerLM(cfg)
    tx = make_optimizer(cfg.d_model, args.warmup_steps, args.lr_k,
                        args.grad_clip)

    rng = np.random.default_rng(args.seed)
    ys0, _ = make_batches(cv_seqs or train_seqs, args.batch_size, u_max,
                          sos, eos, IGNORE_ID)[0]
    variables = lm.init(jax.random.PRNGKey(args.seed), jnp.asarray(ys0))
    state = TrainState.create(variables["params"], tx,
                              jax.random.PRNGKey(args.seed + 1))
    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(state.params))
    print(f"lm: {n_params/1e6:.1f}M params, u_max={u_max}, "
          f"vocab={vocab_size}", file=sys.stderr)

    smoothing = args.label_smoothing

    def loss_fn(params, dropout_rng, ys_in, tgt, deterministic):
        logits = lm.apply({"params": params}, ys_in,
                          deterministic=deterministic,
                          rngs=None if deterministic
                          else {"dropout": dropout_rng})
        loss, n_tok = label_smoothing_loss(logits, tgt, smoothing)
        return loss, n_tok

    @jax.jit
    def train_step(state, ys_in, tgt):
        rng, dropout_rng = jax.random.split(state.rng)
        (loss, n_tok), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, dropout_rng, ys_in, tgt, False)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, rng=rng)
        return new_state, {"loss": loss, "n_tok": n_tok}

    @jax.jit
    def eval_step(params, ys_in, tgt):
        loss, n_tok = loss_fn(params, jax.random.PRNGKey(0), ys_in, tgt,
                              True)
        return {"loss": loss, "n_tok": n_tok}

    ck = Checkpointer(args.save_folder)
    save_lm_config(args.save_folder, cfg)
    start_epoch = 0
    if args.continue_from:
        prev = Checkpointer(args.continue_from)
        state, meta = prev.restore(state)
        start_epoch = meta["epoch"] + 1
        print(f"resumed from step {int(state.step)} (epoch {start_epoch})",
              file=sys.stderr)

    mw = MetricsWriter(os.path.join(args.save_folder, "metrics.jsonl"))
    best_cv = float("inf")
    for epoch in range(start_epoch, args.epochs):
        t_ep = time.time()
        tr_losses, tr_toks = [], []
        for ys_in, tgt in make_batches(train_seqs, args.batch_size, u_max,
                                       sos, eos, IGNORE_ID, rng):
            state, m = train_step(state, jnp.asarray(ys_in),
                                  jnp.asarray(tgt))
            tr_losses.append(m["loss"])
            tr_toks.append(m["n_tok"])
        # token-weighted epoch means (read back once per epoch)
        tr = np.asarray(jax.device_get(tr_losses), np.float64)
        tw = np.asarray(jax.device_get(tr_toks), np.float64)
        tr_loss = float((tr * tw).sum() / max(tw.sum(), 1))
        cv_losses, cv_toks = [], []
        for ys_in, tgt in make_batches(cv_seqs, args.batch_size, u_max,
                                       sos, eos, IGNORE_ID):
            m = eval_step(state.params, jnp.asarray(ys_in), jnp.asarray(tgt))
            cv_losses.append(m["loss"])
            cv_toks.append(m["n_tok"])
        cv = np.asarray(jax.device_get(cv_losses), np.float64)
        cw = np.asarray(jax.device_get(cv_toks), np.float64)
        cv_loss = float((cv * cw).sum() / max(cw.sum(), 1))
        is_best = cv_loss < best_cv
        best_cv = min(best_cv, cv_loss)
        ck.save(state, epoch=epoch, cv_loss=cv_loss, is_best=is_best)
        mw.write({"epoch": epoch, "step": int(state.step), "phase": "cv",
                  "loss": cv_loss, "ppl": float(np.exp(cv_loss)),
                  "train_loss": tr_loss,
                  "train_ppl": float(np.exp(tr_loss)),
                  "epoch_sec": time.time() - t_ep})
    ck.wait()
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
