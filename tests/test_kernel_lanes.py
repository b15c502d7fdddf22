"""Lane-layout math (kernels/lanes.py) vs the reference lie/ implementations.

Pure-jnp comparison on CPU: arrays in lane layout (d, B) are checked against
the batch-leading (B, d) modules by transposition.
"""

import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.kernels import lanes as L
from quadrotorilqr_tpu.lie import se3, so3

B = 32


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(scale * rng.normal(size=shape), jnp.float64)


def _rand_quat(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q, jnp.float64)


def to_lanes(a):
    """(B, ...) -> (..., B)."""
    return jnp.moveaxis(a, 0, -1)


def from_lanes(a):
    return jnp.moveaxis(a, -1, 0)


def test_matrix_ops():
    rng = np.random.default_rng(0)
    a = _rand(rng, (B, 5, 7))
    b = _rand(rng, (B, 7, 4))
    v = _rand(rng, (B, 7))
    np.testing.assert_allclose(
        from_lanes(L.matmul(to_lanes(a), to_lanes(b))), a @ b, atol=1e-12
    )
    np.testing.assert_allclose(
        from_lanes(L.matvec(to_lanes(a), to_lanes(v))),
        jnp.einsum("bij,bj->bi", a, v),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        from_lanes(L.transpose(to_lanes(a))), jnp.swapaxes(a, -1, -2), atol=0
    )
    np.testing.assert_allclose(
        from_lanes(L.block2x2(*[to_lanes(_rand(rng, (B, 3, 3))) for _ in range(4)])).shape,
        (B, 6, 6),
    )


def test_cross_hat_quat():
    rng = np.random.default_rng(1)
    a = _rand(rng, (B, 3))
    b = _rand(rng, (B, 3))
    q = _rand_quat(rng, B)
    p = _rand_quat(rng, B)
    np.testing.assert_allclose(
        from_lanes(L.cross(to_lanes(a), to_lanes(b))), jnp.cross(a, b), atol=1e-12
    )
    np.testing.assert_allclose(from_lanes(L.hat(to_lanes(a))), so3.hat(a), atol=1e-12)
    np.testing.assert_allclose(
        from_lanes(L.quat_multiply(to_lanes(q), to_lanes(p))),
        so3.quat_multiply(q, p),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        from_lanes(L.quat_rotate(to_lanes(q), to_lanes(a))),
        so3.quat_rotate(q, a),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        from_lanes(L.quat_to_matrix(to_lanes(q))), so3.quat_to_matrix(q), atol=1e-12
    )


def test_so3_exp_log_jacs():
    rng = np.random.default_rng(2)
    # mix of generic and tiny angles to hit both branches
    theta = jnp.concatenate(
        [_rand(rng, (B // 2, 3)), _rand(rng, (B // 2, 3), scale=1e-5)], axis=0
    )
    np.testing.assert_allclose(
        from_lanes(L.so3_exp(to_lanes(theta))), so3.exp(theta), atol=1e-14
    )
    q = so3.exp(theta)
    np.testing.assert_allclose(
        from_lanes(L.so3_log(to_lanes(q))), so3.log(q), atol=1e-14
    )
    np.testing.assert_allclose(
        from_lanes(L.so3_left_jacobian(to_lanes(theta))),
        so3.left_jacobian(theta),
        atol=1e-14,
    )
    np.testing.assert_allclose(
        from_lanes(L.so3_left_jacobian_inv(to_lanes(theta))),
        so3.left_jacobian_inv(theta),
        atol=1e-14,
    )


def test_se3_ops():
    rng = np.random.default_rng(3)
    tau = jnp.concatenate(
        [_rand(rng, (B // 2, 6)), _rand(rng, (B // 2, 6), scale=1e-5)], axis=0
    )
    qe, te = L.se3_exp(to_lanes(tau))
    ref = se3.exp(tau)
    np.testing.assert_allclose(from_lanes(qe), ref.quat, atol=1e-14)
    np.testing.assert_allclose(from_lanes(te), ref.trans, atol=1e-14)

    np.testing.assert_allclose(
        from_lanes(L.se3_log(to_lanes(ref.quat), to_lanes(ref.trans))),
        se3.log(ref),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        from_lanes(L.se3_adjoint(to_lanes(ref.quat), to_lanes(ref.trans))),
        se3.adjoint(ref),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        from_lanes(L.se3_right_jacobian(to_lanes(tau))),
        se3.right_jacobian(tau),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        from_lanes(L.se3_right_jacobian_inv(to_lanes(tau))),
        se3.right_jacobian_inv(tau),
        atol=1e-12,
    )
    qi, ti = L.se3_inverse(to_lanes(ref.quat), to_lanes(ref.trans))
    refi = se3.inverse(ref)
    np.testing.assert_allclose(from_lanes(qi), refi.quat, atol=1e-14)
    np.testing.assert_allclose(from_lanes(ti), refi.trans, atol=1e-12)


def test_chol_solve4():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(B, 4, 4))
    a = a @ np.swapaxes(a, -1, -2) + 3.0 * np.eye(4)
    b = rng.normal(size=(B, 4, 13))
    x = from_lanes(
        L.chol_solve4(to_lanes(jnp.asarray(a)), to_lanes(jnp.asarray(b)))
    )
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b), atol=1e-10)


def test_atan2_accuracy_both_dtypes():
    rng = np.random.default_rng(9)
    y = rng.normal(size=4096) * np.exp(rng.uniform(-6, 6, 4096))
    x = rng.normal(size=4096) * np.exp(rng.uniform(-6, 6, 4096))
    ref = np.arctan2(y, x)
    # float64: near machine epsilon
    got64 = np.asarray(
        L.atan2(jnp.asarray(y[None]), jnp.asarray(x[None]))
    )[0]
    np.testing.assert_allclose(got64, ref, atol=1e-14)
    # float32: within a few ulp of f32
    got32 = np.asarray(
        L.atan2(
            jnp.asarray(y[None], jnp.float32), jnp.asarray(x[None], jnp.float32)
        )
    )[0]
    np.testing.assert_allclose(got32, ref.astype(np.float32), atol=5e-7)


def test_jacobian_t_jac_lanes():
    """Lane D[Jᵀw] curvature primitives vs lie/{so3,se3}.py — at scales
    spanning both coefficient-derivative branches (crossover |theta|=0.5)."""
    rng = np.random.default_rng(7)
    for scale in (1e-7, 0.05, 0.45, 0.55, 1.5):
        th = _rand(rng, (B, 3), scale)
        w3 = _rand(rng, (B, 3))
        np.testing.assert_allclose(
            from_lanes(L.so3_left_jacobian_t_jac(to_lanes(th), to_lanes(w3))),
            so3.left_jacobian_t_jac(th, w3),
            rtol=1e-12, atol=1e-12,
        )
        tau = _rand(rng, (B, 6), scale)
        w6 = _rand(rng, (B, 6))
        np.testing.assert_allclose(
            from_lanes(L.se3_left_jacobian_t_jac(to_lanes(tau), to_lanes(w6))),
            se3.left_jacobian_t_jac(tau, w6),
            rtol=1e-12, atol=1e-12,
        )
        np.testing.assert_allclose(
            from_lanes(L.se3_right_jacobian_t_jac(to_lanes(tau), to_lanes(w6))),
            se3.right_jacobian_t_jac(tau, w6),
            rtol=1e-12, atol=1e-12,
        )
