"""CTC forced alignment (Viterbi best path): brute-force oracle on tiny
lattices, span well-formedness, padding/batch invariance."""

import itertools

import jax.numpy as jnp
import numpy as np

from tpu_asr.ops.ctc import ctc_viterbi_align


def brute_force_best_spans(logp, labels, t_len, u_len, blank=0):
    """Enumerate every valid CTC alignment (frame -> lattice state path),
    return the best path's per-token (start, end) frames."""
    s_len = 2 * u_len + 1
    z = [blank] * s_len
    z[1::2] = labels[:u_len]
    best = (-np.inf, None)

    def ok_final(s):
        return s in (s_len - 1, s_len - 2)

    def expand(path, score):
        nonlocal best
        t = len(path)
        if t == t_len:
            if ok_final(path[-1]):
                if score > best[0]:
                    best = (score, list(path))
            return
        s = path[-1]
        nxt = [s, s + 1]
        if s + 2 < s_len and z[s + 2] != blank and z[s + 2] != z[s]:
            nxt.append(s + 2)
        for n in nxt:
            if n < s_len:
                expand(path + [n], score + logp[t, z[n]])

    for s0 in (0, 1) if u_len > 0 else (0,):
        expand([s0], logp[0, z[s0]])
    _, path = best
    starts = [-1] * u_len
    ends = [-1] * u_len
    for t, s in enumerate(path):
        if s % 2 == 1:
            tok = (s - 1) // 2
            if starts[tok] < 0:
                starts[tok] = t
            ends[tok] = t
    return starts, ends


def test_align_matches_brute_force():
    rng = np.random.default_rng(0)
    b, t, u, v = 4, 6, 2, 5
    logits = rng.standard_normal((b, t, v)).astype(np.float32) * 2
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    labels[0, 1] = labels[0, 0]            # repeated label (needs blank gap)
    t_lens = np.array([6, 5, 4, 6], np.int32)
    u_lens = np.array([2, 2, 1, 2], np.int32)
    starts, ends = ctc_viterbi_align(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(t_lens),
        jnp.asarray(u_lens))
    starts, ends = np.asarray(starts), np.asarray(ends)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    for i in range(b):
        ws, we = brute_force_best_spans(logp[i], list(labels[i]),
                                        int(t_lens[i]), int(u_lens[i]))
        assert list(starts[i, : u_lens[i]]) == ws, (i, starts[i], ws)
        assert list(ends[i, : u_lens[i]]) == we, (i, ends[i], we)
        assert np.all(starts[i, u_lens[i]:] == -1)


def test_align_spans_wellformed_and_pad_invariant():
    rng = np.random.default_rng(1)
    b, t, u, v = 3, 40, 6, 12
    logits = rng.standard_normal((b, t, v)).astype(np.float32) * 3
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    t_lens = np.array([40, 33, 25], np.int32)
    u_lens = np.array([6, 5, 4], np.int32)
    starts, ends = ctc_viterbi_align(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(t_lens),
        jnp.asarray(u_lens))
    starts, ends = np.asarray(starts), np.asarray(ends)
    for i in range(b):
        ul, tl = int(u_lens[i]), int(t_lens[i])
        st, en = starts[i, :ul], ends[i, :ul]
        assert np.all(st >= 0) and np.all(en >= st)
        assert np.all(en < tl)
        assert np.all(st[1:] > en[:-1])     # tokens ordered, disjoint

    # widening T and U with garbage doesn't change the spans
    logits2 = np.concatenate(
        [logits, rng.standard_normal((b, 8, v)).astype("f4")], axis=1)
    labels2 = np.concatenate(
        [labels, rng.integers(1, v, (b, 2), dtype=np.int32)], axis=1)
    s2, e2 = ctc_viterbi_align(
        jnp.asarray(logits2), jnp.asarray(labels2), jnp.asarray(t_lens),
        jnp.asarray(u_lens))
    np.testing.assert_array_equal(np.asarray(s2)[:, :u], starts)
    np.testing.assert_array_equal(np.asarray(e2)[:, :u], ends)
