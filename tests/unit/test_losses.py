"""Label-smoothed CE vs the reference formula computed directly, and vs
torch cross_entropy with label_smoothing=0 sanity."""

import numpy as np
import jax.numpy as jnp

from tpu_asr import IGNORE_ID
from tpu_asr.ops.losses import label_smoothing_loss, token_accuracy


def manual_smoothed_ce(logits, targets, eps, ignore=-1):
    """Reference formula (src/transformer/loss.py cal_loss): smoothed one-hot
    one_hot*(1-eps) + (1-one_hot)*eps/(V-1), CE summed over non-pad / n."""
    v = logits.shape[-1]
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    total, n = 0.0, 0
    for b in range(logits.shape[0]):
        for u in range(logits.shape[1]):
            t = targets[b, u]
            if t == ignore:
                continue
            one_hot = np.full(v, eps / (v - 1))
            one_hot[t] = 1 - eps
            total += -(one_hot * logp[b, u]).sum()
            n += 1
    return total / n, n


def test_label_smoothing_matches_manual(rng):
    b, u, v = 3, 5, 7
    logits = rng.standard_normal((b, u, v)).astype(np.float32)
    targets = rng.integers(0, v, (b, u))
    targets[1, 3:] = IGNORE_ID
    targets[2, 1:] = IGNORE_ID
    want, n_want = manual_smoothed_ce(logits, targets, 0.1)
    got, n = label_smoothing_loss(jnp.asarray(logits), jnp.asarray(targets), 0.1)
    assert int(n) == n_want
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_zero_smoothing_is_plain_ce(rng):
    import torch
    b, u, v = 2, 4, 9
    logits = rng.standard_normal((b, u, v)).astype(np.float32)
    targets = rng.integers(0, v, (b, u))
    got, _ = label_smoothing_loss(jnp.asarray(logits), jnp.asarray(targets), 0.0)
    want = torch.nn.functional.cross_entropy(
        torch.tensor(logits).reshape(-1, v), torch.tensor(targets).reshape(-1))
    np.testing.assert_allclose(float(got), want.item(), rtol=1e-5)


def test_token_accuracy():
    logits = jnp.asarray(np.eye(4)[None, [0, 1, 2]].astype(np.float32) * 10)
    targets = jnp.asarray([[0, 1, IGNORE_ID]])
    acc = token_accuracy(logits, targets)
    np.testing.assert_allclose(float(acc), 1.0)
    targets2 = jnp.asarray([[0, 2, IGNORE_ID]])
    np.testing.assert_allclose(float(token_accuracy(logits, targets2)), 0.5)
