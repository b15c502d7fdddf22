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


def test_qr_solve_small_general_matrices():
    """Unrolled Householder QR vs numpy solve on random NON-symmetric
    systems (the associative-Riccati combine blocks)."""
    import numpy as np
    import jax.numpy as jnp

    from quadrotorilqr_tpu.ops.linalg import qr_solve_small

    rng = np.random.default_rng(0)
    a = rng.normal(size=(7, 13, 13))
    a += 3 * np.eye(13)  # well-conditioned but generic
    b = rng.normal(size=(7, 13, 26))
    x = np.asarray(qr_solve_small(jnp.asarray(a), jnp.asarray(b)))
    ref = np.linalg.solve(a, b)
    np.testing.assert_allclose(x, ref, rtol=1e-9, atol=1e-10)

    # negative-diagonal + indefinite cases (sign handling in the reflector)
    a2 = rng.normal(size=(13, 13)) - 2 * np.eye(13)
    b2 = rng.normal(size=(13, 4))
    x2 = np.asarray(qr_solve_small(jnp.asarray(a2), jnp.asarray(b2)))
    np.testing.assert_allclose(x2, np.linalg.solve(a2, b2), rtol=1e-8, atol=1e-9)
