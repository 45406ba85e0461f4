#!/usr/bin/env python
"""Plot training curves from a metrics.jsonl file.

Replaces the reference's optional visdom curves (src/solver/solver.py
--visdom flag) with an offline matplotlib render of the JSONL metrics.

  python bin/plot_metrics.py exp/hybrid/metrics.jsonl -o curves.png
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("metrics", help="metrics.jsonl path")
    p.add_argument("-o", "--output", default="curves.png")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    train, cv = [], []
    with open(args.metrics, encoding="utf-8") as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if r.get("phase") == "train":
                train.append(r)
            elif r.get("phase") == "cv":
                cv.append(r)

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    if train:
        steps = [r["step"] for r in train]
        axes[0].plot(steps, [r["loss"] for r in train], label="train loss")
    if cv:
        axes[0].plot([r["step"] for r in cv], [r["loss"] for r in cv],
                     "o-", label="cv loss")
    axes[0].set_xlabel("step")
    axes[0].set_title("loss")
    axes[0].legend()

    for key, ax in (("acc", axes[1]), ("steps_per_sec", axes[2])):
        pts = [(r["step"], r[key]) for r in train if key in r]
        if pts:
            ax.plot(*zip(*pts))
        ax.set_xlabel("step")
        ax.set_title(key)

    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
