#!/usr/bin/env python
"""Average the params of the last N (or explicitly listed) checkpoints.

Checkpoint averaging is the standard decode-time trick for this model
family (the espnet AISHELL transformer recipes average the last ~10 epoch
snapshots before decoding; the reference lineage decodes final.pth.tar /
best-cv, so this is a strict capability superset): the averaged weights
typically shave a few relative percent off CER at zero inference cost.

Writes a normal checkpoint directory (config sidecar + one orbax step +
best.json pointing at it) that bin/recognize.py consumes unchanged:

  python bin/average_checkpoints.py --ckpt exp/hybrid --out exp/hybrid_avg --last 5
  python bin/recognize.py --ckpt exp/hybrid_avg --manifest test.jsonl ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="source checkpoint dir")
    p.add_argument("--out", required=True, help="output checkpoint dir")
    p.add_argument("--last", type=int, default=5,
                   help="average the newest N saved steps (default 5)")
    p.add_argument("--steps", default="",
                   help="comma-separated explicit steps (overrides --last)")
    p.add_argument("--platform", default="",
                   help="force jax platform (e.g. cpu) — overrides plugins")
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
    import orbax.checkpoint as ocp

    from tpu_asr.train.checkpoints import Checkpointer

    src = Checkpointer(args.ckpt)
    all_steps = sorted(src.manager.all_steps() or [])
    if not all_steps:
        sys.exit(f"no checkpoints in {args.ckpt}")
    if args.steps:
        steps = sorted(int(s) for s in args.steps.split(","))
        missing = [s for s in steps if s not in all_steps]
        if missing:
            sys.exit(f"steps {missing} not in {args.ckpt} "
                     f"(available: {all_steps})")
    else:
        steps = all_steps[-args.last:]
    print(f"averaging steps {steps} of {all_steps}")

    def restore_raw(step):
        # no abstract target: orbax reconstructs the saved pytree (a nested
        # dict keyed by the TrainState field paths) as host numpy arrays,
        # which round-trips through StandardSave with identical paths.
        out = src.manager.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(),
                meta=ocp.args.JsonRestore()))
        return out["state"], out["meta"]

    acc_state, meta = restore_raw(steps[-1])   # newest: opt state/step/rng
    acc = jax.tree.map(
        lambda x: x.astype(jnp.float32) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, acc_state["params"])
    for step in steps[:-1]:
        state, _ = restore_raw(step)
        acc = jax.tree.map(
            lambda a, x: a + x.astype(a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            acc, state["params"])
    n = float(len(steps))
    avg = jax.tree.map(
        lambda a, ref: (a / n).astype(ref.dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        acc, acc_state["params"])
    acc_state["params"] = avg

    dst = Checkpointer(args.out)
    dst.save_config(src.load_config())
    out_step = int(steps[-1])
    # save directly through the manager: the averaged pytree is already the
    # serialized dict form, and best.json makes --restore best pick it up.
    dst.manager.save(out_step, args=ocp.args.Composite(
        state=ocp.args.StandardSave(acc_state),
        meta=ocp.args.JsonSave({**meta, "averaged_steps": steps,
                                "is_best": True})))
    dst.wait()
    import json
    with open(os.path.join(dst.directory, "best.json"), "w") as f:
        json.dump({"step": out_step, "averaged_steps": steps}, f)
    print(f"wrote averaged checkpoint (step {out_step}, n={len(steps)}) "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
