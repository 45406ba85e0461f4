#!/usr/bin/env python
"""Score a hypothesis JSONL against a reference manifest (CER/WER).

Replaces the reference's score.sh/sclite stage with the native threaded
Levenshtein scorer. Prints corpus CER with sub/ins/del breakdown and the
worst utterances.

  python bin/score.py --manifest test.jsonl --hyp exp/hybrid/hyp.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", required=True)
    p.add_argument("--hyp", required=True)
    p.add_argument("--worst", type=int, default=5)
    args = p.parse_args()

    from tpu_asr.data.manifest import load_manifest
    from tpu_asr import native
    from tpu_asr.utils.cer import cer

    refs = {u.id: u.tokens for u in load_manifest(args.manifest)}
    hyps = {}
    with open(args.hyp, encoding="utf-8") as f:
        for line in f:
            d = json.loads(line)
            hyps[d["id"]] = d["hyp_tokens"]
    ids = [i for i in hyps if i in refs]
    missing = len(hyps) - len(ids)
    r = [refs[i] for i in ids]
    h = [hyps[i] for i in ids]
    score = cer(r, h)
    per = native.batch_edit_distance([list(x) for x in r],
                                     [list(x) for x in h])
    worst = sorted(
        ((per[j, 0] / max(len(r[j]), 1), ids[j]) for j in range(len(ids))),
        reverse=True)[: args.worst]
    print(json.dumps({
        "n_utts": len(ids), "missing_refs": missing,
        "cer": round(score["cer"], 4),
        "sub": score["sub"], "ins": score["ins"], "del": score["del"],
        "ref_tokens": score["ref_len"],
        "worst": [{"id": uid, "cer": round(c, 3)} for c, uid in worst],
    }))


if __name__ == "__main__":
    main()
