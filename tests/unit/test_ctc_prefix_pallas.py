"""Pallas prefix-scorer kernel (interpret mode) vs the lax.scan path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_asr.decode.ctc_prefix import CTCPrefixScorer

pytestmark = pytest.mark.slow


def test_pallas_scorer_matches_scan(rng):
    n, t, v, k = 4, 15, 10, 5
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((n, t, v)).astype(np.float32)), -1)
    lens = jnp.asarray([15, 12, 9, 15])
    cands = jnp.asarray(rng.integers(1, v, (n, k)).astype(np.int32))
    y_last = jnp.asarray(rng.integers(1, v, (n,)).astype(np.int32))
    # make some candidates repeat the last symbol (exercises the phi mask)
    cands = cands.at[:, 0].set(y_last)
    for is_first_flag in (True, False):
        is_first = jnp.full((n,), is_first_flag)
        s_scan = CTCPrefixScorer(logp, lens, blank=0, eos=v - 1,
                                 use_pallas=False)
        s_pal = CTCPrefixScorer(logp, lens, blank=0, eos=v - 1,
                                use_pallas=True)  # interpret on CPU
        st1 = s_scan.init_state()
        st2 = s_pal.init_state()
        psi1, r1 = s_scan.score(cands, y_last, is_first, st1)
        psi2, r2 = s_pal.score(cands, y_last, is_first, st2)
        np.testing.assert_allclose(np.asarray(psi1), np.asarray(psi2),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.clip(np.asarray(r1), -1e31, None),
            np.clip(np.asarray(r2), -1e31, None), rtol=1e-5, atol=1e-4)


def test_pallas_scorer_multi_step(rng):
    """Walk a 3-token prefix through both paths; states must stay equal."""
    n, t, v = 2, 12, 8
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((n, t, v)).astype(np.float32)), -1)
    lens = jnp.asarray([12, 10])
    toks = [3, 3, 5]
    s1 = CTCPrefixScorer(logp, lens, blank=0, eos=v - 1, use_pallas=False)
    s2 = CTCPrefixScorer(logp, lens, blank=0, eos=v - 1, use_pallas=True)
    st1, st2 = s1.init_state(), s2.init_state()
    y_last = jnp.asarray([v - 2, v - 2])
    for i, c in enumerate(toks):
        cands = jnp.full((n, 1), c, jnp.int32)
        first = jnp.full((n,), i == 0)
        psi1, r1 = s1.score(cands, y_last, first, st1)
        psi2, r2 = s2.score(cands, y_last, first, st2)
        np.testing.assert_allclose(np.asarray(psi1), np.asarray(psi2),
                                   rtol=1e-5, atol=1e-5)
        st1 = (r1[:, 0], psi1[:, 0])
        st2 = (r2[:, 0], psi2[:, 0])
        y_last = jnp.full((n,), c, jnp.int32)


def test_pallas_scorer_score_only_and_packing(rng):
    """return_hist=False returns identical psi (the cheap score pass for
    two-pass joint decoding), across n/k shapes that exercise the beam
    lane-packing (p = 128//k beams per row, n not divisible by p)."""
    from tpu_asr.ops.pallas.ctc_prefix import ctc_prefix_scan_pallas
    for n, t, k in [(4, 15, 5), (13, 9, 21), (3, 7, 11), (2, 5, 130)]:
        v = 40
        logp = jax.nn.log_softmax(jnp.asarray(
            rng.standard_normal((n, t, v)).astype(np.float32)), -1)
        lens = jnp.asarray(rng.integers(2, t + 1, (n,)).astype(np.int32))
        cands = jnp.asarray(rng.integers(1, v, (n, k)).astype(np.int32))
        y_last = jnp.asarray(rng.integers(1, v, (n,)).astype(np.int32))
        s_scan = CTCPrefixScorer(logp, lens, blank=0, use_pallas=False)
        s_pal = CTCPrefixScorer(logp, lens, blank=0, use_pallas=True)
        st = s_scan.init_state()
        is_first = jnp.full((n,), True)
        psi_ref, r_ref = s_scan.score(cands, y_last, is_first, st)
        psi_h, r_h = s_pal.score(cands, y_last, is_first, st)
        psi_n, r_n = s_pal.score(cands, y_last, is_first, st,
                                 return_r=False)
        assert r_n is None
        np.testing.assert_allclose(np.asarray(psi_ref), np.asarray(psi_h),
                                   rtol=1e-5, atol=1e-5, err_msg=str((n, k)))
        np.testing.assert_allclose(np.asarray(psi_h), np.asarray(psi_n),
                                   rtol=1e-6, atol=1e-6, err_msg=str((n, k)))
        np.testing.assert_allclose(
            np.clip(np.asarray(r_ref), -1e31, None),
            np.clip(np.asarray(r_h), -1e31, None), rtol=1e-5, atol=1e-4,
            err_msg=str((n, k)))
