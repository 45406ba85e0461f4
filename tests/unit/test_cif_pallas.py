"""Pallas CIF fire kernel vs the XLA overlap-matmul reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_asr.ops.cif import cif_fire
from tpu_asr.ops.pallas.cif import cif_fire_pallas

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("t,u,d", [(40, 12, 16), (130, 20, 32)])
def test_cif_pallas_matches_reference(rng, t, u, d):
    b = 2
    hidden = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    alphas = jnp.asarray(rng.uniform(0, 0.9, (b, t)).astype(np.float32))
    want = cif_fire(hidden, alphas, u)
    got = cif_fire_pallas(hidden, alphas, u, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_cif_pallas_grads(rng):
    b, t, u, d = 2, 35, 8, 8
    hidden = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    alphas = jnp.asarray(rng.uniform(0.05, 0.6, (b, t)).astype(np.float32))

    def f_pal(h, a):
        return jnp.sum(cif_fire_pallas(h, a, u, True) ** 2)

    def f_ref(h, a):
        return jnp.sum(cif_fire(h, a, u) ** 2)

    g1 = jax.grad(f_pal, argnums=(0, 1))(hidden, alphas)
    g2 = jax.grad(f_ref, argnums=(0, 1))(hidden, alphas)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)
