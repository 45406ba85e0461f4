"""CIF: the parallel overlap/matmul formulation must reproduce the
sequential accumulate-and-fire scan exactly (fire positions, boundary weight
splitting, values), plus scaling/quantity-loss/tail behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_asr.ops.cif import (cif_fire, cif_weights, cif_scan_reference,
                             scale_alphas, quantity_loss, fire_count)


def test_weights_sum_to_fire_mass(rng):
    alphas = jnp.asarray(rng.uniform(0, 1, (2, 30)).astype(np.float32))
    w = cif_weights(alphas, u_max=20)
    total = np.asarray(alphas).sum(axis=1)
    # mass placed in output u is min(1, max(0, c_T - u)); full fires get 1.0
    got_mass = np.asarray(w).sum(axis=1)
    for b in range(2):
        for u in range(20):
            want = np.clip(total[b] - u, 0, 1)
            np.testing.assert_allclose(got_mass[b, u], want, rtol=1e-4, atol=1e-5)


def test_cif_fire_matches_sequential_scan(rng):
    t, d = 40, 8
    hidden = rng.standard_normal((t, d)).astype(np.float32)
    alphas = rng.uniform(0, 0.9, (t,)).astype(np.float32)
    fired_ref, n_ref, accum, acc_vec = cif_scan_reference(
        jnp.asarray(hidden), jnp.asarray(alphas))
    got = cif_fire(jnp.asarray(hidden)[None], jnp.asarray(alphas)[None],
                   u_max=t)[0]
    n_ref = int(n_ref)
    assert n_ref == int(np.floor(alphas.sum()))
    np.testing.assert_allclose(np.asarray(got)[:n_ref],
                               np.asarray(fired_ref)[:n_ref],
                               rtol=1e-4, atol=1e-5)
    # the partial tail accumulation appears in output slot n_ref
    np.testing.assert_allclose(np.asarray(got)[n_ref], np.asarray(acc_vec),
                               rtol=1e-3, atol=1e-4)


def test_scaled_alphas_fire_exactly_u(rng):
    t, d, u = 50, 4, 7
    hidden = jnp.asarray(rng.standard_normal((1, t, d)).astype(np.float32))
    alphas = jnp.asarray(rng.uniform(0.01, 0.99, (1, t)).astype(np.float32))
    mask = jnp.ones((1, t), bool)
    scaled = scale_alphas(alphas, mask, jnp.asarray([u]))
    np.testing.assert_allclose(float(scaled.sum()), u, rtol=1e-5)
    fired = cif_fire(hidden, scaled, u_max=u + 2)
    # outputs beyond u receive (numerically) zero mass
    assert float(jnp.abs(fired[0, u + 1]).max()) < 1e-3
    w = cif_weights(scaled, u_max=u)
    np.testing.assert_allclose(np.asarray(w.sum(axis=1))[0], np.ones(u),
                               rtol=1e-4)


def test_quantity_loss():
    alphas = jnp.asarray([[0.5, 0.5, 0.5, 0.5]])
    mask = jnp.ones((1, 4), bool)
    ql = quantity_loss(alphas, mask, jnp.asarray([3]))
    np.testing.assert_allclose(float(ql), 1.0, rtol=1e-6)


def test_fire_count_tail_rounding():
    mask = jnp.ones((1, 4), bool)
    assert int(fire_count(jnp.asarray([[1.0, 1.0, 0.3, 0.0]]), mask)[0]) == 2
    assert int(fire_count(jnp.asarray([[1.0, 1.0, 0.6, 0.0]]), mask)[0]) == 3


def test_cif_fire_differentiable(rng):
    t, d, u = 20, 4, 5
    hidden = jnp.asarray(rng.standard_normal((1, t, d)).astype(np.float32))
    alphas = jnp.asarray(rng.uniform(0.1, 0.5, (1, t)).astype(np.float32))

    def f(a):
        mask = jnp.ones_like(a, bool)
        scaled = scale_alphas(jax.nn.sigmoid(a), mask, jnp.asarray([u]))
        return jnp.sum(cif_fire(hidden, scaled, u_max=u) ** 2)

    g = jax.grad(f)(alphas)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
