#!/usr/bin/env python
"""Export a tpu-asr checkpoint to a reference-style torch `.pth.tar`.

The inverse of `bin/recognize.py --torch-ckpt`: writes the reference's
`Transformer.serialize` layout (hyperparams + kaituoxu/eastonYi-lineage
state_dict names) so weights trained here can be loaded by a
reference-style PyTorch stack. transformer / ctc / hybrid models.

  python bin/export_torch.py --ckpt exp/aishell_hybrid \
      --out exp/aishell_hybrid/final.pth.tar --restore best
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="checkpoint dir")
    p.add_argument("--out", required=True, help="output .pth.tar path")
    p.add_argument("--restore", default="best", choices=["best", "latest"])
    p.add_argument("--platform", default="",
                   help="force jax platform (e.g. cpu)")
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
    import jax.numpy as jnp

    from tpu_asr.models import build_model
    from tpu_asr.parity.torch_export import export_torch_checkpoint
    from tpu_asr.train import TrainState, make_optimizer
    from tpu_asr.train.checkpoints import Checkpointer

    ck = Checkpointer(args.ckpt)
    cfg = ck.load_config()
    model = build_model(cfg)
    t0 = 80
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, t0, cfg.d_input), jnp.float32),
                           jnp.full((1,), t0, jnp.int32),
                           jnp.zeros((1, 4), jnp.int32),
                           jnp.full((1,), 4, jnp.int32))
    tx = make_optimizer(cfg.d_model)
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(0))
    step = (ck.latest_step() if args.restore == "latest" else ck.best_step())
    state, meta = ck.restore(state, step=step)
    export_torch_checkpoint(args.out, {"params": state.params}, cfg,
                            epoch=int(meta.get("epoch", 0)),
                            cv_loss=float(meta.get("cv_loss", 0.0)))
    print(f"wrote {args.out} (step {int(state.step)}, "
          f"model_type={cfg.model_type})", file=sys.stderr)


if __name__ == "__main__":
    main()
