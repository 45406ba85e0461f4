"""Host-side character/word error rate scoring.

First-party replacement for the reference's sclite/score.sh stage
(reference: egs/aishell/ final scoring stage). Pure-Python Levenshtein over
token sequences; not perf-critical.
"""

from __future__ import annotations

from collections.abc import Sequence


def edit_distance(ref: Sequence, hyp: Sequence) -> dict:
    """Levenshtein distance with substitution/insertion/deletion breakdown."""
    n, m = len(ref), len(hyp)
    # dp[j] = (cost, subs, ins, dels) for prefix alignment
    prev = [(j, 0, j, 0) for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [(i, 0, 0, i)] + [None] * m
        for j in range(1, m + 1):
            if ref[i - 1] == hyp[j - 1]:
                cur[j] = prev[j - 1]
            else:
                sub = prev[j - 1]
                ins = cur[j - 1]
                dele = prev[j]
                best = min(sub, ins, dele, key=lambda x: x[0])
                if best is sub:
                    cur[j] = (best[0] + 1, best[1] + 1, best[2], best[3])
                elif best is ins:
                    cur[j] = (best[0] + 1, best[1], best[2] + 1, best[3])
                else:
                    cur[j] = (best[0] + 1, best[1], best[2], best[3] + 1)
        prev = cur
    cost, subs, ins, dels = prev[m]
    return {"distance": cost, "sub": subs, "ins": ins, "del": dels, "ref_len": n}


def cer(refs: Sequence[Sequence], hyps: Sequence[Sequence]) -> dict:
    """Corpus-level error rate over parallel ref/hyp token sequences.

    Uses the threaded C++ scorer (tpu_asr.native) on integer-id sequences;
    falls back to the python DP for non-hashable/int tokens.
    """
    assert len(refs) == len(hyps), (len(refs), len(hyps))
    tot = {"distance": 0, "sub": 0, "ins": 0, "del": 0, "ref_len": 0}
    try:
        rints = [[int(x) for x in r] for r in refs]
        hints = [[int(x) for x in h] for h in hyps]
    except (TypeError, ValueError):
        rints = None
    if rints is not None and len(refs) > 0:
        from tpu_asr import native
        out = native.batch_edit_distance(rints, hints)
        tot["distance"] = int(out[:, 0].sum())
        tot["sub"] = int(out[:, 1].sum())
        tot["ins"] = int(out[:, 2].sum())
        tot["del"] = int(out[:, 3].sum())
        tot["ref_len"] = sum(len(r) for r in rints)
    else:
        for r, h in zip(refs, hyps):
            d = edit_distance(list(r), list(h))
            for k in tot:
                tot[k] += d[k]
    tot["cer"] = tot["distance"] / max(tot["ref_len"], 1)
    return tot
