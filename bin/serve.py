#!/usr/bin/env python
"""ASR model server: HTTP endpoints over micro-batched compiled decode.

Beyond-the-reference deployment surface (the reference's decode story ends
at the offline src/bin/recognize.py loop): loads a checkpoint, compiles
one decode program per (input kind, frame bucket) at startup, then serves

  GET  /healthz     model + batcher stats
  POST /recognize   {"feats": [[...]] | "wav": [...], "nbest": k}
  POST /stream      {"session": "abc", "feats": [[...]], "final": false}

with dynamic micro-batching (batch up to --batch-size requests per
--window-ms) onto static TPU shapes. See tpu_asr/serve.py.

  python bin/serve.py --ckpt exp/aishell_hybrid --mode joint --beam 10 \
      --dict data/aishell/dict.txt --port 8080
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="checkpoint dir")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--mode", default="",
                   choices=["", "greedy_ctc", "ctc_beam", "beam", "joint",
                            "attn_rescore", "cif_greedy", "cif_beam",
                            "transducer_greedy", "transducer_beam",
                            "transducer_rescore"])
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--max-len", type=int, default=100)
    p.add_argument("--ctc-weight", type=float, default=0.3)
    p.add_argument("--lm-ckpt", default="",
                   help="external LM dir (bin/train_lm.py) for shallow "
                        "fusion / rescoring, as in bin/recognize.py")
    p.add_argument("--lm-weight", type=float, default=0.3)
    p.add_argument("--dict", dest="dict_path", default="",
                   help="token dict file -> 'text' fields in responses")
    p.add_argument("--bucket-frames", default="512,1000",
                   help="comma-separated static frame buckets")
    p.add_argument("--batch-size", type=int, default=8,
                   help="static rows per compiled decode program")
    p.add_argument("--window-ms", type=float, default=15.0,
                   help="micro-batch collection window after first request")
    p.add_argument("--inputs", default="feats,wav",
                   help="input kinds to warm up (feats,wav)")
    p.add_argument("--stream-beam", type=int, default=1,
                   help="beam for /stream sessions (1 = greedy CTC)")
    p.add_argument("--no-streaming", action="store_true")
    p.add_argument("--restore", default="best", choices=["best", "latest"])
    p.add_argument("--step", type=int, default=-1)
    p.add_argument("--platform", default="",
                   help="force jax platform (e.g. cpu) — overrides plugins")
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

    from tpu_asr.decode.beam import BeamConfig
    from tpu_asr.decode.recognizer import Recognizer
    from tpu_asr.frontend import FrontendConfig
    from tpu_asr.models import build_model
    from tpu_asr.serve import AsrServer, StreamSessions, make_http_server
    from tpu_asr.train import TrainState, make_optimizer
    from tpu_asr.train.checkpoints import Checkpointer

    ck = Checkpointer(args.ckpt)
    cfg = ck.load_config()
    mode = args.mode or {
        "ctc": "greedy_ctc", "transformer": "beam", "hybrid": "joint",
        "cif": "cif_greedy",
        "transducer": "transducer_greedy"}[cfg.model_type]
    if mode == "joint" and cfg.model_type != "hybrid":
        mode = "beam"

    # restore params (recognize.py pattern: dummy init then orbax restore)
    model = build_model(cfg)
    dummy_t = 80
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, dummy_t, cfg.d_input), jnp.float32),
                           jnp.full((1,), dummy_t, jnp.int32),
                           jnp.zeros((1, 4), jnp.int32),
                           jnp.full((1,), 4, jnp.int32))
    tx = make_optimizer(cfg.d_model)
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(0))
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
        lv = TransformerLM(lm_cfg).init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 2), jnp.int32))
        lm_state = TrainState.create(lv["params"],
                                     make_optimizer(lm_cfg.d_model),
                                     jax.random.PRNGKey(0))
        lck = Checkpointer(args.lm_ckpt)
        lm_state, _ = lck.restore(lm_state, step=lck.best_step())
        lm_params = {"params": lm_state.params}

    rec = Recognizer(
        cfg=cfg, params=params, mode=mode,
        frontend=ck.load_frontend() or FrontendConfig(),
        beam=BeamConfig(beam=args.beam, max_len=args.max_len,
                        nbest=args.beam,   # requests slice their own nbest
                        ctc_weight=args.ctc_weight
                        if mode in ("joint", "attn_rescore",
                                    "transducer_rescore") else 0.0,
                        lm_weight=args.lm_weight if args.lm_ckpt else 0.0),
        lm_cfg=lm_cfg, lm_params=lm_params)

    buckets = tuple(int(x) for x in args.bucket_frames.split(","))
    server = AsrServer(rec, bucket_frames=buckets,
                       batch_size=args.batch_size,
                       window_ms=args.window_ms)
    kinds = tuple(k.strip() for k in args.inputs.split(",") if k.strip())
    print(f"warming up {len(kinds)}x{len(buckets)} decode programs "
          f"(mode={mode}, batch={args.batch_size})...",
          file=sys.stderr, flush=True)
    server.warmup(kinds=kinds)
    server.start()

    streams = None
    if not args.no_streaming and cfg.input_layer == "conv2d" and (
            cfg.model_type in ("ctc", "hybrid")
            or (cfg.model_type == "transducer"
                and cfg.enc_chunk_size > 0)):
        streams = StreamSessions(cfg, params, beam=args.stream_beam)

    char_list = None
    if args.dict_path:
        from tpu_asr.utils.vocab import Vocab
        char_list = Vocab.load(args.dict_path).tokens

    httpd = make_http_server(args.host, args.port, server, streams,
                             char_list)
    print(json.dumps({"serving": f"http://{args.host}:{args.port}",
                      "mode": mode, "buckets": list(buckets),
                      "batch_size": args.batch_size,
                      "streaming": streams is not None}), flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()


if __name__ == "__main__":
    main()
