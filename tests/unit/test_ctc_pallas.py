"""Pallas CTC forward-backward vs the pure-JAX scan (and thus vs torch):
values and gradients, including padded/infeasible rows. Runs in interpret
mode on CPU; compiled on TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_asr.ops.ctc import ctc_loss
from tpu_asr.ops.pallas.ctc import ctc_loss_pallas

pytestmark = pytest.mark.slow


def make_case(seed, b=5, t=20, u=6, v=12):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    ilens = rng.integers(u + 2, t + 1, b).astype(np.int32)
    ilens[0] = t
    llens = rng.integers(1, u + 1, b).astype(np.int32)
    llens[0] = u
    return (jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(ilens),
            jnp.asarray(llens))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_ctc_matches_scan(seed):
    logits, labels, ilens, llens = make_case(seed)
    want = ctc_loss(logits, labels, ilens, llens, reduction="none")
    got = ctc_loss_pallas(logits, labels, ilens, llens, reduction="none",
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_pallas_ctc_grads_match_scan():
    logits, labels, ilens, llens = make_case(3)

    def f_ref(lg):
        return ctc_loss(lg, labels, ilens, llens, reduction="sum")

    def f_pal(lg):
        return ctc_loss_pallas(lg, labels, ilens, llens, reduction="sum",
                               interpret=True)

    g_ref = jax.grad(f_ref)(logits)
    g_pal = jax.grad(f_pal)(logits)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_ctc_infeasible_zero():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((1, 3, 8)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, 8, (1, 5)).astype(np.int32))
    out = ctc_loss_pallas(logits, labels, jnp.asarray([3]), jnp.asarray([5]),
                          reduction="none", interpret=True)
    assert float(out[0]) == 0.0
