"""SO(3)/SE(3) core tests.

Mirrors the reference's finite-difference verification strategy
(/root/reference/src/quadrotor_model_test.cc:30-78: central FD, eps=1e-6,
rel err < 1% or abs err < 1e-12) and additionally cross-checks every analytic
Jacobian against jax.jacfwd of the defining map — something the C++ reference
could not do.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadrotorilqr_tpu.lie import se3, so3

KEY = jax.random.PRNGKey(0)


def random_tangents(key, n, scale=1.0):
    """Random SE(3) tangents with angular norm kept inside the injectivity
    radius (|theta| < pi) so exp/log roundtrips are exact."""
    tau = scale * jax.random.normal(key, (n, 6), dtype=jnp.float64)
    ang_norm = jnp.linalg.norm(tau[:, 3:6], axis=-1, keepdims=True)
    shrink = jnp.minimum(1.0, 3.0 / jnp.maximum(ang_norm, 1e-12))
    return tau.at[:, 3:6].multiply(shrink)


def random_se3(key, n=1, scale=1.0):
    return se3.exp(random_tangents(key, n, scale))


def fd_jacobian(f, x, eps=1e-6):
    """Central finite differences of f: R^n -> R^m at x."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[-1]
    cols = []
    for i in range(n):
        dx = np.zeros_like(x)
        dx[..., i] = eps
        cols.append((np.asarray(f(x + dx)) - np.asarray(f(x - dx))) / (2 * eps))
    return np.stack(cols, axis=-1)


def assert_close(a, b, rtol=1e-6, atol=1e-9, msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol, err_msg=msg)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------


class TestSO3:
    def test_exp_log_roundtrip(self):
        thetas = jax.random.normal(KEY, (64, 3), dtype=jnp.float64)
        assert_close(so3.log(so3.exp(thetas)), thetas, atol=1e-12)

    def test_exp_log_roundtrip_small(self):
        thetas = 1e-8 * jax.random.normal(KEY, (16, 3), dtype=jnp.float64)
        assert_close(so3.log(so3.exp(thetas)), thetas, atol=1e-18)

    def test_log_negative_hemisphere(self):
        # q and -q are the same rotation; log must agree (angle in (-pi, pi]).
        thetas = jax.random.normal(KEY, (16, 3), dtype=jnp.float64)
        q = so3.exp(thetas)
        assert_close(so3.log(-q), so3.log(q), atol=1e-12)

    def test_rotate_matches_matrix(self):
        q = so3.exp(jax.random.normal(KEY, (8, 3), dtype=jnp.float64))
        v = jax.random.normal(jax.random.PRNGKey(1), (8, 3), dtype=jnp.float64)
        r = so3.quat_to_matrix(q)
        assert_close(so3.quat_rotate(q, v), jnp.einsum("...ij,...j->...i", r, v), atol=1e-13)

    def test_matrix_orthonormal(self):
        r = so3.quat_to_matrix(so3.exp(jax.random.normal(KEY, (8, 3), dtype=jnp.float64)))
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), r.shape)
        assert_close(r @ jnp.swapaxes(r, -1, -2), eye, atol=1e-13)
        assert_close(jnp.linalg.det(r), jnp.ones(8), atol=1e-13)

    @pytest.mark.parametrize("scale", [1.0, 1e-5])
    def test_left_jacobian_fd(self, scale):
        """Jl(theta) = d/d(dtheta) Log(Exp(theta + dtheta) * Exp(theta)^-1)|0
        equivalently Exp(theta + dtheta) ~ Exp(Jl dtheta) * Exp(theta)."""
        theta = scale * np.array([0.3, -0.7, 0.5])

        def f(th):
            q = so3.exp(jnp.asarray(th))
            return so3.log(so3.quat_multiply(q, so3.quat_conjugate(so3.exp(jnp.asarray(theta)))))

        jl_fd = fd_jacobian(f, theta, eps=1e-7 * max(scale, 1e-2))
        assert_close(so3.left_jacobian(jnp.asarray(theta)), jl_fd, rtol=1e-5, atol=1e-8)

    @pytest.mark.parametrize("scale", [1.0, 1e-5])
    def test_right_jacobian_fd(self, scale):
        """Exp(theta + dtheta) ~ Exp(theta) * Exp(Jr dtheta)."""
        theta = scale * np.array([0.4, 0.2, -0.9])

        def f(th):
            q = so3.exp(jnp.asarray(th))
            return so3.log(so3.quat_multiply(so3.quat_conjugate(so3.exp(jnp.asarray(theta))), q))

        jr_fd = fd_jacobian(f, theta, eps=1e-7 * max(scale, 1e-2))
        assert_close(so3.right_jacobian(jnp.asarray(theta)), jr_fd, rtol=1e-5, atol=1e-8)

    @pytest.mark.parametrize("scale", [2.0, 1.0, 1e-2, 1e-5, 1e-9])
    def test_jacobian_inverses(self, scale):
        theta = scale * jnp.asarray(np.array([[0.3, -0.7, 0.5], [0.9, 0.1, -0.2]]))
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), (2, 3, 3))
        assert_close(so3.left_jacobian(theta) @ so3.left_jacobian_inv(theta), eye, atol=1e-11)
        assert_close(so3.right_jacobian(theta) @ so3.right_jacobian_inv(theta), eye, atol=1e-11)

    def test_jr_is_jl_transpose(self):
        theta = jnp.asarray(np.random.default_rng(3).normal(size=(5, 3)))
        assert_close(
            so3.right_jacobian(theta),
            jnp.swapaxes(so3.left_jacobian(theta), -1, -2),
            atol=1e-12,
        )


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------


class TestSE3:
    def test_exp_log_roundtrip(self):
        taus = random_tangents(jax.random.PRNGKey(2), 64)
        assert_close(se3.log(se3.exp(taus)), taus, atol=1e-11)

    def test_exp_log_roundtrip_small(self):
        taus = random_tangents(jax.random.PRNGKey(3), 16, scale=1e-8)
        assert_close(se3.log(se3.exp(taus)), taus, atol=1e-18)

    def test_compose_inverse(self):
        x = random_se3(jax.random.PRNGKey(4), 8)
        ident = se3.multiply(x, se3.inverse(x))
        assert_close(ident.trans, jnp.zeros((8, 3)), atol=1e-12)
        assert_close(jnp.abs(ident.quat[..., 0]), jnp.ones(8), atol=1e-12)

    def test_associativity(self):
        ka, kb, kc = jax.random.split(jax.random.PRNGKey(5), 3)
        a, b, c = random_se3(ka, 4), random_se3(kb, 4), random_se3(kc, 4)
        ab_c = se3.multiply(se3.multiply(a, b), c)
        a_bc = se3.multiply(a, se3.multiply(b, c))
        assert_close(ab_c.trans, a_bc.trans, atol=1e-12)
        assert_close(se3.minus(ab_c, a_bc), jnp.zeros((4, 6)), atol=1e-12)

    def test_adjoint_property(self):
        """X Exp(tau) = Exp(Adj_X tau) X."""
        x = random_se3(jax.random.PRNGKey(6), 4)
        tau = random_tangents(jax.random.PRNGKey(7), 4, scale=0.5)
        lhs = se3.multiply(x, se3.exp(tau))
        adj_tau = jnp.einsum("...ij,...j->...i", se3.adjoint(x), tau)
        rhs = se3.multiply(se3.exp(adj_tau), x)
        assert_close(se3.minus(lhs, rhs), jnp.zeros((4, 6)), atol=1e-10)

    @pytest.mark.parametrize("scale", [1.0, 1e-5])
    def test_se3_right_jacobian_autodiff(self, scale):
        """Jr(tau) = d/d(dtau) Log(Exp(tau)^-1 Exp(tau + dtau))|0 — cross-check
        the Barfoot Q-matrix against jax.jacfwd."""
        tau = scale * jnp.asarray([0.3, -0.7, 0.5, 0.2, 0.4, -0.6], dtype=jnp.float64)
        base_inv = se3.inverse(se3.exp(tau))

        def f(dtau):
            return se3.minus(se3.exp(tau + dtau), se3.exp(tau))  # left-ish ...

        def f_right(dtau):
            return se3.log(se3.multiply(base_inv, se3.exp(tau + dtau)))

        jr_ad = jax.jacfwd(f_right)(jnp.zeros(6, dtype=jnp.float64))
        assert_close(se3.right_jacobian(tau), jr_ad, rtol=1e-8, atol=1e-10)

    @pytest.mark.parametrize("scale", [1.0, 1e-5])
    def test_se3_left_jacobian_autodiff(self, scale):
        tau = scale * jnp.asarray([-0.2, 0.6, 0.1, -0.5, 0.3, 0.8], dtype=jnp.float64)
        base_inv = se3.inverse(se3.exp(tau))

        def f_left(dtau):
            return se3.log(se3.multiply(se3.exp(tau + dtau), base_inv))

        jl_ad = jax.jacfwd(f_left)(jnp.zeros(6, dtype=jnp.float64))
        assert_close(se3.left_jacobian(tau), jl_ad, rtol=1e-8, atol=1e-10)

    @pytest.mark.parametrize("scale", [2.0, 1.0, 1e-3, 1e-7])
    def test_se3_jacobian_inverses(self, scale):
        tau = scale * random_tangents(jax.random.PRNGKey(8), 4)
        eye = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float64), (4, 6, 6))
        assert_close(se3.left_jacobian(tau) @ se3.left_jacobian_inv(tau), eye, atol=1e-10)
        assert_close(se3.right_jacobian(tau) @ se3.right_jacobian_inv(tau), eye, atol=1e-10)

    def test_plus_jacobians_autodiff(self):
        """manif plus: J_x in the (right) tangent of x, J_tau plain."""
        x = random_se3(jax.random.PRNGKey(9), 1, scale=0.8)
        tau = random_tangents(jax.random.PRNGKey(10), 1, scale=0.6)
        y, j_x, j_tau = se3.plus_jacobians(x, tau)

        def f_x(dx):
            return se3.minus(se3.plus(se3.plus(x, dx[None]), tau[0]), y)[0]

        def f_tau(dtau):
            return se3.minus(se3.plus(x, tau[0] + dtau), y)[0]

        zero = jnp.zeros(6, dtype=jnp.float64)
        assert_close(j_x[0], jax.jacfwd(f_x)(zero), rtol=1e-8, atol=1e-10)
        assert_close(j_tau[0], jax.jacfwd(f_tau)(zero), rtol=1e-8, atol=1e-10)

    def test_minus_jacobians_autodiff(self):
        kl, kr = jax.random.split(jax.random.PRNGKey(11))
        lhs, rhs = random_se3(kl, 1, 0.7), random_se3(kr, 1, 0.7)
        tau, j_lhs, j_rhs = se3.minus_jacobians(lhs, rhs)

        def f_lhs(d):
            return se3.minus(se3.plus(lhs, d[None]), rhs)[0]

        def f_rhs(d):
            return se3.minus(lhs, se3.plus(rhs, d[None]))[0]

        zero = jnp.zeros(6, dtype=jnp.float64)
        assert_close(j_lhs[0], jax.jacfwd(f_lhs)(zero), rtol=1e-8, atol=1e-10)
        assert_close(j_rhs[0], jax.jacfwd(f_rhs)(zero), rtol=1e-8, atol=1e-10)

    def test_plus_minus_consistency(self):
        x = random_se3(jax.random.PRNGKey(12), 8)
        tau = random_tangents(jax.random.PRNGKey(13), 8, scale=0.5)
        assert_close(se3.minus(se3.plus(x, tau), x), tau, atol=1e-11)

    def test_vmap_jit(self):
        taus = random_tangents(jax.random.PRNGKey(14), 32)
        batched = jax.jit(jax.vmap(lambda t: se3.log(se3.exp(t))))(taus)
        assert_close(batched, taus, atol=1e-11)


class TestJacobianTransposeJacs:
    """Analytic D[Jᵀw] primitives (the second differential of the exp chart
    contracted with a fixed cotangent — the foundation of the kernel-side
    DDP curvature, solver/ddp.vfxx_analytic) vs nested jax.jacfwd."""

    @pytest.mark.parametrize("scale", [1e-8, 1e-4, 0.05, 0.3, 0.49, 0.51, 2.0])
    def test_so3_left_jacobian_t_jac(self, scale):
        k1, k2 = jax.random.split(jax.random.PRNGKey(17))
        thetas = scale * jax.random.normal(k1, (8, 3), dtype=jnp.float64)
        ws = jax.random.normal(k2, (8, 3), dtype=jnp.float64)
        got = so3.left_jacobian_t_jac(thetas, ws)
        ref = jax.vmap(
            lambda th, w: jax.jacfwd(
                lambda t: jnp.einsum("ji,j->i", so3.left_jacobian(t), w)
            )(th)
        )(thetas, ws)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-10)

    @pytest.mark.parametrize("scale", [1e-8, 1e-4, 0.05, 0.3, 0.49, 0.51, 2.0])
    def test_se3_jacobian_t_jacs(self, scale):
        k1, k2 = jax.random.split(jax.random.PRNGKey(29))
        taus = scale * jax.random.normal(k1, (8, 6), dtype=jnp.float64)
        ws = jax.random.normal(k2, (8, 6), dtype=jnp.float64)
        got_l = se3.left_jacobian_t_jac(taus, ws)
        ref_l = jax.vmap(
            lambda tau, w: jax.jacfwd(
                lambda t: jnp.einsum("ji,j->i", se3.left_jacobian(t), w)
            )(tau)
        )(taus, ws)
        np.testing.assert_allclose(got_l, ref_l, rtol=1e-9, atol=1e-10)
        got_r = se3.right_jacobian_t_jac(taus, ws)
        ref_r = jax.vmap(
            lambda tau, w: jax.jacfwd(
                lambda t: jnp.einsum("ji,j->i", se3.right_jacobian(t), w)
            )(tau)
        )(taus, ws)
        np.testing.assert_allclose(got_r, ref_r, rtol=1e-9, atol=1e-10)

    def test_linear_in_w(self):
        # the primitive is linear in the cotangent — the property the
        # per-stage kernel usage depends on (w = incoming value gradient)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
        tau = jax.random.normal(k1, (6,), dtype=jnp.float64)
        w1 = jax.random.normal(k2, (6,), dtype=jnp.float64)
        w2 = jax.random.normal(k3, (6,), dtype=jnp.float64)
        a = se3.right_jacobian_t_jac(tau, 2.0 * w1 - 0.5 * w2)
        b = 2.0 * se3.right_jacobian_t_jac(tau, w1) - 0.5 * se3.right_jacobian_t_jac(tau, w2)
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14)
