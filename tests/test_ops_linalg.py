"""Unrolled small-Cholesky solves vs numpy (ops/linalg.py)."""

import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.ops import linalg as L


def _rand_spd(rng, batch, n):
    a = rng.normal(size=batch + (n, n))
    return a @ np.swapaxes(a, -1, -2) + 3.0 * np.eye(n)


def test_cholesky_matches_numpy():
    rng = np.random.default_rng(0)
    for n in (3, 4):
        a = _rand_spd(rng, (5,), n)
        l = np.asarray(L.cholesky_small(jnp.asarray(a)))
        np.testing.assert_allclose(l, np.linalg.cholesky(a), rtol=1e-12, atol=1e-12)


def test_solve_matrix_and_vector():
    rng = np.random.default_rng(1)
    for n, k in ((3, 4), (4, 13)):
        a = _rand_spd(rng, (7,), n)
        b = rng.normal(size=(7, n, k))
        x = np.asarray(L.chol_solve_small(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(x, np.linalg.solve(a, b), rtol=1e-10, atol=1e-12)
        bv = rng.normal(size=(7, n))
        xv = np.asarray(L.chol_solve_vec(jnp.asarray(a), jnp.asarray(bv)))
        np.testing.assert_allclose(
            xv, np.linalg.solve(a, bv[..., None])[..., 0], rtol=1e-10, atol=1e-12
        )


def test_broadcast_unbatched_matrix_batched_rhs():
    rng = np.random.default_rng(2)
    a = _rand_spd(rng, (), 3)
    b = rng.normal(size=(40, 3))
    x = np.asarray(L.chol_solve_vec(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(a, b.T).T, rtol=1e-10, atol=1e-12)
