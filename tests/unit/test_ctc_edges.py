"""CTC edge cases: zero-length labels, U == T tight fits, single-frame
inputs, scan-vs-pallas fuzz across shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_asr.ops.ctc import ctc_loss
from tpu_asr.ops.pallas.ctc import ctc_loss_pallas


def torch_ctc_none(logits, labels, ilens, llens):
    import torch
    lp = torch.log_softmax(torch.tensor(np.asarray(logits),
                                        dtype=torch.float64), dim=-1)
    return torch.nn.CTCLoss(blank=0, reduction="none", zero_infinity=True)(
        lp.transpose(0, 1), torch.tensor(np.asarray(labels)),
        torch.tensor(np.asarray(ilens)),
        torch.tensor(np.asarray(llens))).numpy()


def test_zero_length_labels(rng):
    """llen=0: the loss is the all-blank path probability."""
    b, t, u, v = 2, 6, 3, 5
    logits = jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, (b, u)).astype(np.int32))
    ilens = jnp.asarray([6, 4])
    llens = jnp.asarray([0, 2])
    got = ctc_loss(logits, labels, ilens, llens, reduction="none")
    want = torch_ctc_none(logits, labels, ilens, llens)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)
    got_p = ctc_loss_pallas(logits, labels, ilens, llens, reduction="none",
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), want, rtol=1e-4)


def test_tight_fit_t_equals_u(rng):
    """T == U with distinct labels: exactly one alignment."""
    v = 8
    labels = jnp.asarray([[1, 2, 3]])
    logits = jnp.asarray(rng.standard_normal((1, 3, v)).astype(np.float32))
    got = ctc_loss(logits, labels, jnp.asarray([3]), jnp.asarray([3]),
                   reduction="none")
    logp = jax.nn.log_softmax(logits, -1)
    want = -(logp[0, 0, 1] + logp[0, 1, 2] + logp[0, 2, 3])
    np.testing.assert_allclose(float(got[0]), float(want), rtol=1e-5)


def test_single_frame(rng):
    v = 6
    logits = jnp.asarray(rng.standard_normal((1, 1, v)).astype(np.float32))
    labels = jnp.asarray([[4]])
    got = ctc_loss(logits, labels, jnp.asarray([1]), jnp.asarray([1]),
                   reduction="none")
    logp = jax.nn.log_softmax(logits, -1)
    np.testing.assert_allclose(float(got[0]), -float(logp[0, 0, 4]),
                               rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(4))
def test_fuzz_scan_vs_pallas_vs_torch(seed):
    rng = np.random.default_rng(100 + seed)
    b = int(rng.integers(1, 6))
    t = int(rng.integers(3, 26))
    u = int(rng.integers(1, max(2, t // 2)))
    v = int(rng.integers(3, 20))
    logits = jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, (b, u)).astype(np.int32))
    ilens = jnp.asarray(rng.integers(1, t + 1, b).astype(np.int32))
    llens = jnp.asarray(rng.integers(0, u + 1, b).astype(np.int32))
    want = torch_ctc_none(logits, labels, ilens, llens)
    # torch zero_infinity zeroes infeasible; mirror the feasibility mask
    feasible = np.asarray(ilens) >= np.asarray(llens)
    want = np.where(np.isfinite(want), want, 0.0)
    got_s = np.asarray(ctc_loss(logits, labels, ilens, llens,
                                reduction="none"))
    got_p = np.asarray(ctc_loss_pallas(logits, labels, ilens, llens,
                                       reduction="none", interpret=True))
    # only compare where torch found a finite loss AND our feasibility
    # heuristic agrees (repeated labels can make T>=U still infeasible;
    # both paths zero those rows via the torch-compatible zero_infinity)
    np.testing.assert_allclose(got_s, want, rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(got_p, want, rtol=2e-4, atol=1e-4)
