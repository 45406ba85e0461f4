#!/usr/bin/env python
"""Render exp/synth_eval/cer_vs_mode.jsonl as a markdown table.

Usage: python egs/synth_eval/summarize.py [path/to/cer_vs_mode.jsonl]

The JSONL is one row per decode run (egs/synth_eval/run.sh stage 3/4);
this prints a stable, sorted markdown table for pasting into BASELINE.md
and a one-line recommendation of the best mode by (CER, then speed).
"""

from __future__ import annotations

import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "exp/synth_eval/cer_vs_mode.jsonl"
    rows = [json.loads(l) for l in open(path) if l.strip()]
    dev = [r for r in rows if r.get("split") != "train_overfit"]
    train = [r for r in rows if r.get("split") == "train_overfit"]

    def tag(r):
        t = f"{r['mode']} b{r.get('beam', 1)}"
        if r.get("lm_weight"):
            t += f" +lm{r['lm_weight']}"
        if r.get("length_penalty"):
            t += f" lp{r['length_penalty']}"
        return t

    print("| decode | CER | inverse-RTF | n |")
    print("|---|---|---|---|")
    for r in sorted(dev, key=lambda r: (r.get("cer", 9), -r["inverse_rtf"])):
        print(f"| {tag(r)} | {r.get('cer', '—')} | {r['inverse_rtf']}x "
              f"| {r['n_utts']} |")
    if train:
        print("\ntrain-overfit search sanity (stage 4):")
        print("| decode | CER | inverse-RTF |")
        print("|---|---|---|")
        for r in train:
            print(f"| {r['mode']} | {r.get('cer', '—')} "
                  f"| {r['inverse_rtf']}x |")
    best = min(dev, key=lambda r: (r.get("cer", 9), -r["inverse_rtf"]))
    print(f"\nbest dev mode: {tag(best)} (CER {best.get('cer')}, "
          f"{best['inverse_rtf']}x)")


if __name__ == "__main__":
    main()
