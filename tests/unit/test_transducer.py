"""Transducer (RNN-T) loss tests: brute-force alignment-enumeration oracle,
fused-scan vs full-logits equality, torch autograd grad twin, padding
invariance, and reductions. Covers tpu_asr/ops/transducer.py."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tpu_asr.ops.transducer import (transducer_forward_fused,
                                    transducer_loss,
                                    transducer_loss_from_logits)


def brute_force_nll(log_probs, labels, t_len, u_len, blank=0):
    """Sum path probabilities over every monotonic (T,U) alignment.

    log_probs: [T, U+1, V] log-softmaxed joint outputs for ONE utterance.
    A path assigns each emit u (consuming labels[u]) a frame t_u with
    t_0 <= t_1 <= ... ; every other (frame, row) node emits blank,
    including the terminal blank at (t_len-1, u_len).
    """
    total = -np.inf
    for emit_frames in itertools.product(range(t_len), repeat=u_len):
        if any(emit_frames[i] > emit_frames[i + 1]
               for i in range(u_len - 1)):
            continue
        lp = 0.0
        u = 0
        for t in range(t_len):
            while u < u_len and emit_frames[u] == t:
                lp += log_probs[t, u, labels[u]]
                u += 1
            lp += log_probs[t, u, blank]   # blank advances to frame t+1
        total = np.logaddexp(total, lp)
    return -total


def torch_transducer_nll(logits, labels, t_len, u_len, blank=0):
    """Torch twin of the alpha recursion (batch of 1), autograd-able."""
    lp = torch.log_softmax(logits, dim=-1)      # [T, U1, V]
    alpha = {}
    alpha[(0, 0)] = torch.tensor(0.0, dtype=logits.dtype)
    for t in range(t_len):
        for u in range(u_len + 1):
            if (t, u) not in alpha:
                continue
            a = alpha[(t, u)]
            if t + 1 <= t_len - 1 or (t + 1 == t_len and u == u_len):
                nb = a + lp[t, u, blank]
                key = (t + 1, u)
                alpha[key] = (torch.logaddexp(alpha[key], nb)
                              if key in alpha else nb)
            if u < u_len:
                ne = a + lp[t, u, labels[u]]
                key = (t, u + 1)
                alpha[key] = (torch.logaddexp(alpha[key], ne)
                              if key in alpha else ne)
    return -alpha[(t_len, u_len)]


def _rand_case(rng, b, t, u1, v, h=6):
    f = rng.standard_normal((b, t, h)).astype(np.float32)
    g = rng.standard_normal((b, u1, h)).astype(np.float32)
    w = (rng.standard_normal((h, v)) * 0.5).astype(np.float32)
    bias = (rng.standard_normal(v) * 0.1).astype(np.float32)
    labels = rng.integers(1, v, (b, u1 - 1)).astype(np.int32)
    return f, g, w, bias, labels


def _full_logits(f, g, w, bias):
    joint = np.tanh(f[:, :, None, :] + g[:, None, :, :])
    return joint @ w + bias                      # [B, T, U1, V]


def test_matches_brute_force_enumeration():
    rng = np.random.default_rng(0)
    b, t, u1, v = 3, 4, 3, 5
    f, g, w, bias, labels = _rand_case(rng, b, t, u1, v)
    t_lens = np.array([4, 3, 2], np.int32)
    u_lens = np.array([2, 1, 0], np.int32)

    nll = np.asarray(transducer_loss(
        jnp.asarray(f), jnp.asarray(g), jnp.asarray(w), jnp.asarray(bias),
        jnp.asarray(labels), jnp.asarray(t_lens), jnp.asarray(u_lens),
        reduction="none"))

    logits = _full_logits(f, g, w, bias)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    for i in range(b):
        want = brute_force_nll(lp[i], labels[i], int(t_lens[i]),
                               int(u_lens[i]))
        assert nll[i] == pytest.approx(want, abs=1e-4), i


def test_fused_equals_full_logits_path():
    rng = np.random.default_rng(1)
    b, t, u1, v = 4, 7, 5, 9
    f, g, w, bias, labels = _rand_case(rng, b, t, u1, v)
    t_lens = np.array([7, 5, 6, 1], np.int32)
    u_lens = np.array([4, 2, 0, 1], np.int32)
    fused = transducer_loss(
        jnp.asarray(f), jnp.asarray(g), jnp.asarray(w), jnp.asarray(bias),
        jnp.asarray(labels), jnp.asarray(t_lens), jnp.asarray(u_lens),
        reduction="none")
    full = transducer_loss_from_logits(
        jnp.asarray(_full_logits(f, g, w, bias)), jnp.asarray(labels),
        jnp.asarray(t_lens), jnp.asarray(u_lens))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_torch_twin():
    rng = np.random.default_rng(2)
    b, t, u1, v = 3, 5, 4, 6
    f, g, w, bias, labels = _rand_case(rng, b, t, u1, v)
    t_lens = np.array([5, 4, 3], np.int32)
    u_lens = np.array([3, 2, 1], np.int32)

    def loss_fn(f_, g_, w_, b_):
        return jnp.sum(transducer_loss(
            f_, g_, w_, b_, jnp.asarray(labels), jnp.asarray(t_lens),
            jnp.asarray(u_lens), reduction="none"))

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(
        jnp.asarray(f), jnp.asarray(g), jnp.asarray(w), jnp.asarray(bias))

    tf = torch.tensor(f, requires_grad=True)
    tg = torch.tensor(g, requires_grad=True)
    tw = torch.tensor(w, requires_grad=True)
    tb = torch.tensor(bias, requires_grad=True)
    total = 0.0
    for i in range(b):
        joint = torch.tanh(tf[i, :, None, :] + tg[i, None, :, :])
        logits = joint @ tw + tb
        total = total + torch_transducer_nll(
            logits, labels[i], int(t_lens[i]), int(u_lens[i]))
    total.backward()

    for got, want in zip(grads, (tf.grad, tg.grad, tw.grad, tb.grad)):
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=2e-4, atol=2e-5)


def test_padding_invariance():
    """Extra padded frames, label slots and dummy rows don't change NLLs."""
    rng = np.random.default_rng(3)
    b, t, u1, v, h = 2, 5, 4, 6, 6
    f, g, w, bias, labels = _rand_case(rng, b, t, u1, v, h)
    t_lens = np.array([5, 3], np.int32)
    u_lens = np.array([3, 2], np.int32)
    base = transducer_loss(
        jnp.asarray(f), jnp.asarray(g), jnp.asarray(w), jnp.asarray(bias),
        jnp.asarray(labels), jnp.asarray(t_lens), jnp.asarray(u_lens),
        reduction="none")

    # widen T and U with garbage, add a dummy row (t_len == 0)
    f2 = np.concatenate([f, rng.standard_normal((b, 3, h)).astype("f4")], 1)
    g2 = np.concatenate([g, rng.standard_normal((b, 2, h)).astype("f4")], 1)
    lab2 = np.concatenate([labels, rng.integers(1, v, (b, 2), dtype=np.int32)], 1)
    f2 = np.concatenate([f2, f2[:1]], 0)
    g2 = np.concatenate([g2, g2[:1]], 0)
    lab2 = np.concatenate([lab2, lab2[:1]], 0)
    t2 = np.concatenate([t_lens, [0]]).astype(np.int32)
    u2 = np.concatenate([u_lens, [0]]).astype(np.int32)
    padded = transducer_loss(
        jnp.asarray(f2), jnp.asarray(g2), jnp.asarray(w), jnp.asarray(bias),
        jnp.asarray(lab2), jnp.asarray(t2), jnp.asarray(u2),
        reduction="none")
    np.testing.assert_allclose(np.asarray(padded[:b]), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
    assert float(padded[b]) == 0.0


def test_reductions():
    rng = np.random.default_rng(4)
    f, g, w, bias, labels = _rand_case(rng, 3, 4, 3, 5)
    t_lens = np.array([4, 4, 4], np.int32)
    u_lens = np.array([2, 2, 1], np.int32)
    args = (jnp.asarray(f), jnp.asarray(g), jnp.asarray(w),
            jnp.asarray(bias), jnp.asarray(labels), jnp.asarray(t_lens),
            jnp.asarray(u_lens))
    none = np.asarray(transducer_loss(*args, reduction="none"))
    assert float(transducer_loss(*args, reduction="sum")) == \
        pytest.approx(none.sum(), rel=1e-6)
    assert float(transducer_loss(*args, reduction="mean")) == \
        pytest.approx(none.mean(), rel=1e-6)
    assert float(transducer_loss(*args, reduction="mean_label")) == \
        pytest.approx((none / np.maximum(u_lens, 1)).mean(), rel=1e-6)
    with pytest.raises(ValueError):
        transducer_loss(*args, reduction="nope")
