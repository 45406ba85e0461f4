"""exact_top_k must be a bit-exact drop-in for lax.top_k (incl. ties)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.ops.topk import exact_top_k


@pytest.mark.parametrize("shape,k", [
    ((9, 4233), 21),        # beam candidate shape (padded groups)
    ((4, 4096), 11),        # exact multiple of group
    ((2, 3, 700), 5),       # >2D leading shape
    ((5, 130), 21),         # small V -> fallback path
    ((3, 4233), 200),       # k >= group -> fallback path
])
def test_matches_lax_top_k(shape, k):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    v0, i0 = jax.lax.top_k(x, k)
    v1, i1 = exact_top_k(x, k)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_tie_breaking_matches():
    # heavy ties: few distinct values spread across many groups
    x = jax.random.randint(jax.random.PRNGKey(1), (6, 4233), 0, 7
                           ).astype(jnp.float32)
    v0, i0 = jax.lax.top_k(x, 33)
    v1, i1 = exact_top_k(x, 33)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_neg_inf_rows():
    x = jnp.full((3, 4233), -jnp.inf)
    v1, i1 = exact_top_k(x, 4)
    v0, i0 = jax.lax.top_k(x, 4)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
