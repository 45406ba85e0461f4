#!/usr/bin/env python
"""Data preparation CLI: Kaldi/espnet-style inputs -> tpu-asr manifests.

Replaces the reference's egs/aishell data-prep stages (Kaldi wav.scp/text
parsing, char dict building, data2json.sh). Three input modes:

  --espnet-json data.json          espnet manifest (reference format)
  --wav-scp wav.scp --text text    Kaldi pair (wav mode, on-device fbank)
  --synthetic N                    synthetic tone dataset (demos/tests)

Builds the char dict (<blank>/<unk>/chars/<sos>/<eos>) from the text when
--dict-out is given, or encodes with an existing --dict.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--espnet-json")
    p.add_argument("--wav-scp")
    p.add_argument("--text")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--vocab-size", type=int, default=64,
                   help="synthetic mode vocab")
    p.add_argument("--seed", type=int, default=0,
                   help="synthetic mode RNG seed (distinct seeds give "
                        "disjoint train/dev corpora)")
    p.add_argument("--noise", type=float, default=0.01,
                   help="synthetic mode additive-noise sigma (task "
                        "difficulty knob for held-out evals)")
    p.add_argument("--text-dist", default="uniform",
                   choices=["uniform", "markov"],
                   help="synthetic transcript distribution; markov draws "
                        "from a fixed bigram language (seeded separately "
                        "from --seed) so an external LM has structure to "
                        "learn")
    p.add_argument("--dict", dest="dict_path")
    p.add_argument("--dict-out")
    p.add_argument("--out", required=True, help="manifest path (.jsonl)")
    return p.parse_args()


def main():
    args = parse_args()
    from tpu_asr.data.audio import wav_num_samples
    from tpu_asr.data.manifest import (Utterance, load_espnet_json,
                                       save_manifest)
    from tpu_asr.utils.vocab import Vocab

    if args.synthetic:
        from tpu_asr.data.synthetic import write_synthetic_manifest
        utts = write_synthetic_manifest(args.out, args.synthetic,
                                        args.vocab_size, seed=args.seed,
                                        noise=args.noise,
                                        text=args.text_dist)
        print(f"wrote {len(utts)} synthetic utts -> {args.out}")
        return

    if args.espnet_json:
        utts = load_espnet_json(args.espnet_json)
        save_manifest(utts, args.out)
        print(f"converted {len(utts)} utts from {args.espnet_json}")
        return

    assert args.wav_scp and args.text, "need --wav-scp + --text"
    texts = {}
    with open(args.text, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if len(parts) == 2:
                texts[parts[0]] = parts[1].replace(" ", "")
    if args.dict_path:
        vocab = Vocab.load(args.dict_path)
    else:
        chars = set()
        for t in texts.values():
            chars.update(t)
        vocab = Vocab.build(chars)
        if args.dict_out:
            vocab.save(args.dict_out)
            print(f"wrote dict ({len(vocab)} tokens) -> {args.dict_out}")
    utts = []
    with open(args.wav_scp, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if len(parts) != 2 or parts[0] not in texts:
                continue
            uid, path = parts
            text = texts[uid]
            utts.append(Utterance(
                id=uid, tokens=vocab.encode(text), text=text, wav=path,
                num_samples=wav_num_samples(path)))
    save_manifest(utts, args.out)
    print(f"wrote {len(utts)} utts -> {args.out}")


if __name__ == "__main__":
    main()
