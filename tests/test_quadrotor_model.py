"""Quadrotor model tests.

Ports the reference's verification strategy (quadrotor_model_test.cc):
  * seeded random SPD inertia A@A.T + 3I (:22-28),
  * closed-form dynamics checks with identity inertia (:94-143),
  * central-FD Jacobian verification along each tangent/control axis (:30-78),
plus jax.jacfwd cross-checks of every analytic Jacobian (impossible in C++).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models import quadrotor as qm

F64 = jnp.float64


def random_params(seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(3, 3))
    inertia = a @ a.T + 3 * np.eye(3)
    return qm.QuadrotorParams.create(
        mass_kg=1.0 + rng.uniform(),
        inertia=jnp.asarray(inertia, F64),
        arm_length_m=0.25 + rng.uniform(),
        torque_to_thrust_ratio_m=0.1 * rng.uniform(),
        g_mpss=9.81,
    )


def random_state(seed=1, scale=1.0):
    rng = np.random.default_rng(seed)
    tau = scale * rng.normal(size=6)
    tau[3:] *= min(1.0, 2.5 / max(np.linalg.norm(tau[3:]), 1e-9))
    return qm.State(
        pose=se3.exp(jnp.asarray(tau, F64)),
        vel=jnp.asarray(scale * rng.normal(size=6), F64),
    )


def random_control(seed=2, scale=2.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(scale * rng.normal(size=4), F64)


def perturb_state(x, dx):
    """x (+) dx along the 12-dim tangent (the FD probe of the reference,
    quadrotor_model_test.cc:34-45 uses the same group perturbation)."""
    return qm.add(x, dx)


def state_fd_jacobian(f, x, eps=1e-6):
    """Central FD of a tangent-valued f at state x along all 12 axes."""
    cols = []
    for i in range(12):
        dx = jnp.zeros(12, dtype=F64).at[i].set(eps)
        hi = f(perturb_state(x, dx))
        lo = f(perturb_state(x, -dx))
        cols.append((hi - lo) / (2 * eps))
    return jnp.stack(cols, axis=-1)


def control_fd_jacobian(f, u, eps=1e-6):
    cols = []
    for i in range(4):
        du = jnp.zeros(4, dtype=F64).at[i].set(eps)
        cols.append((f(u + du) - f(u - du)) / (2 * eps))
    return jnp.stack(cols, axis=-1)


def assert_jacobian_close(analytic, fd, rtol=1e-5, atol=1e-9):
    np.testing.assert_allclose(np.asarray(analytic), np.asarray(fd), rtol=rtol, atol=atol)


class TestContinuousDynamics:
    def test_hover_equilibrium(self):
        """At identity pose with hover thrust, all accelerations vanish
        (closed-form check in the spirit of quadrotor_model_test.cc:94-143)."""
        params = qm.QuadrotorParams.create(1.0, jnp.eye(3, dtype=F64), 1.0, 0.0, 9.81)
        x = qm.state_identity(dtype=F64)
        u = jnp.full((4,), 9.81 / 4.0, dtype=F64)
        xdot = qm.continuous_dynamics(params, x, u)
        np.testing.assert_allclose(np.asarray(xdot), np.zeros(12), atol=1e-12)

    def test_net_thrust(self):
        """Identity inertia, zero gravity: pure thrust gives a = sum(u)/m e_z."""
        params = qm.QuadrotorParams.create(2.0, jnp.eye(3, dtype=F64), 1.0, 0.0, 0.0)
        x = qm.state_identity(dtype=F64)
        u = jnp.asarray([1.0, 1.0, 1.0, 1.0], F64)
        xdot = qm.continuous_dynamics(params, x, u)
        np.testing.assert_allclose(np.asarray(xdot[6:9]), [0, 0, 2.0], atol=1e-12)
        np.testing.assert_allclose(np.asarray(xdot[9:12]), np.zeros(3), atol=1e-12)

    def test_roll_moment(self):
        """Differential thrust u=[0,-1,0,1]... moment_arms row x: L*(u3-u1)."""
        params = qm.QuadrotorParams.create(1.0, jnp.eye(3, dtype=F64), 0.5, 0.0, 0.0)
        x = qm.state_identity(dtype=F64)
        u = jnp.asarray([0.0, -1.0, 0.0, 1.0], F64)
        xdot = qm.continuous_dynamics(params, x, u)
        # M = moment_arms @ u = [0.5*(-(-1)+1), 0, 0] = [1.0, 0, 0]
        np.testing.assert_allclose(np.asarray(xdot[9:12]), [1.0, 0, 0], atol=1e-12)

    def test_gyroscopic_term(self):
        """Nonzero omega with anisotropic inertia: a_ang = -I^-1 (w x I w)."""
        inertia = jnp.diag(jnp.asarray([1.0, 2.0, 3.0], F64))
        params = qm.QuadrotorParams.create(1.0, inertia, 1.0, 0.0, 0.0)
        omega = jnp.asarray([0.3, -0.5, 0.7], F64)
        x = qm.State(pose=se3.identity(dtype=F64), vel=jnp.concatenate([jnp.zeros(3, F64), omega]))
        xdot = qm.continuous_dynamics(params, x, jnp.zeros(4, F64))
        expected = -jnp.linalg.solve(inertia, jnp.cross(omega, inertia @ omega))
        np.testing.assert_allclose(np.asarray(xdot[9:12]), np.asarray(expected), atol=1e-12)

    def test_config_rate_is_velocity(self):
        params = random_params()
        x = random_state()
        xdot = qm.continuous_dynamics(params, x, random_control())
        np.testing.assert_allclose(np.asarray(xdot[0:6]), np.asarray(x.vel), atol=1e-15)

    def test_jacobians_fd(self):
        """FD check matching quadrotor_model_test.cc:199-249."""
        params, x, u = random_params(), random_state(), random_control()
        _, j_x, j_u = qm.continuous_dynamics_jacobians(params, x, u)
        fd_x = state_fd_jacobian(lambda s: qm.continuous_dynamics(params, s, u), x)
        fd_u = control_fd_jacobian(lambda uu: qm.continuous_dynamics(params, x, uu), u)
        assert_jacobian_close(j_x, fd_x, rtol=1e-4, atol=1e-7)
        assert_jacobian_close(j_u, fd_u, rtol=1e-6, atol=1e-10)

    def test_jacobians_autodiff(self):
        """Exact cross-check: jacfwd of dynamics composed with group perturbation."""
        params, x, u = random_params(3), random_state(4), random_control(5)
        _, j_x, j_u = qm.continuous_dynamics_jacobians(params, x, u)
        ad_x = jax.jacfwd(lambda d: qm.continuous_dynamics(params, perturb_state(x, d), u))(
            jnp.zeros(12, F64)
        )
        ad_u = jax.jacfwd(lambda uu: qm.continuous_dynamics(params, x, uu))(u)
        assert_jacobian_close(j_x, ad_x, rtol=1e-10, atol=1e-12)
        assert_jacobian_close(j_u, ad_u, rtol=1e-10, atol=1e-12)


class TestAddMinus:
    def test_add_jacobians_fd(self):
        """quadrotor_model_test.cc:251-296."""
        x = random_state(6)
        t = jnp.asarray(np.random.default_rng(7).normal(size=12), F64)
        _, j_lhs, j_rhs = qm.add_jacobians(x, t)
        fd_lhs = state_fd_jacobian(lambda s: qm.minus(qm.add(s, t), qm.add(x, t)), x)
        fd_rhs = np.stack(
            [
                np.asarray(
                    qm.minus(
                        qm.add(x, t + jnp.zeros(12, F64).at[i].set(1e-6)),
                        qm.add(x, t),
                    )
                    - qm.minus(
                        qm.add(x, t - jnp.zeros(12, F64).at[i].set(1e-6)),
                        qm.add(x, t),
                    )
                )
                / 2e-6
                for i in range(12)
            ],
            axis=-1,
        )
        assert_jacobian_close(j_lhs, fd_lhs, rtol=1e-4, atol=1e-7)
        assert_jacobian_close(j_rhs, fd_rhs, rtol=1e-4, atol=1e-7)

    def test_minus_jacobians_fd(self):
        """quadrotor_model_test.cc:298-346."""
        lhs, rhs = random_state(8), random_state(9)
        _, j_lhs, j_rhs = qm.minus_jacobians(lhs, rhs)
        fd_lhs = state_fd_jacobian(lambda s: qm.minus(s, rhs), lhs)
        fd_rhs = state_fd_jacobian(lambda s: qm.minus(lhs, s), rhs)
        assert_jacobian_close(j_lhs, fd_lhs, rtol=1e-4, atol=1e-7)
        assert_jacobian_close(j_rhs, fd_rhs, rtol=1e-4, atol=1e-7)

    def test_add_minus_roundtrip(self):
        x = random_state(10)
        t = 0.3 * jnp.asarray(np.random.default_rng(11).normal(size=12), F64)
        np.testing.assert_allclose(np.asarray(qm.minus(qm.add(x, t), x)), np.asarray(t), atol=1e-11)


class TestDiscreteDynamics:
    def test_euler_step_matches_manual(self):
        """x_next = x (+) dt*xdot."""
        params, x, u = random_params(), random_state(), random_control()
        dt = 0.05
        xdot = qm.continuous_dynamics(params, x, u)
        x_next = qm.discrete_dynamics(params, x, u, dt)
        manual = qm.add(x, dt * xdot)
        np.testing.assert_allclose(np.asarray(qm.minus(x_next, manual)), np.zeros(12), atol=1e-13)

    def test_jacobians_fd(self):
        """quadrotor_model_test.cc:145-197."""
        params, x, u = random_params(12), random_state(13), random_control(14)
        dt = 0.1
        _, j_x, j_u = qm.discrete_dynamics_jacobians(params, x, u, dt)
        fd_x = state_fd_jacobian(
            lambda s: qm.minus(
                qm.discrete_dynamics(params, s, u, dt), qm.discrete_dynamics(params, x, u, dt)
            ),
            x,
        )
        fd_u = control_fd_jacobian(
            lambda uu: qm.minus(
                qm.discrete_dynamics(params, x, uu, dt), qm.discrete_dynamics(params, x, u, dt)
            ),
            u,
        )
        assert_jacobian_close(j_x, fd_x, rtol=1e-4, atol=1e-7)
        assert_jacobian_close(j_u, fd_u, rtol=1e-4, atol=1e-7)

    def test_jacobians_autodiff(self):
        params, x, u = random_params(15), random_state(16), random_control(17)
        dt = 0.1
        x_next, j_x, j_u = qm.discrete_dynamics_jacobians(params, x, u, dt)

        def f_x(d):
            return qm.minus(qm.discrete_dynamics(params, perturb_state(x, d), u, dt), x_next)

        def f_u(uu):
            return qm.minus(qm.discrete_dynamics(params, x, uu, dt), x_next)

        assert_jacobian_close(j_x, jax.jacfwd(f_x)(jnp.zeros(12, F64)), rtol=1e-9, atol=1e-11)
        assert_jacobian_close(j_u, jax.jacfwd(f_u)(u), rtol=1e-9, atol=1e-11)

    def test_batched_consistency(self):
        """vmapped dynamics == per-sample dynamics."""
        params = random_params()
        states = [random_state(s) for s in range(4)]
        controls = [random_control(s) for s in range(4)]
        batched_state = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        batched_u = jnp.stack(controls)
        out = jax.vmap(lambda s, uu: qm.discrete_dynamics(params, s, uu, 0.1))(
            batched_state, batched_u
        )
        for i in range(4):
            single = qm.discrete_dynamics(params, states[i], controls[i], 0.1)
            np.testing.assert_allclose(
                np.asarray(jax.tree.leaves(out)[0][i]), np.asarray(jax.tree.leaves(single)[0]),
                atol=1e-14,
            )


class TestParams:
    def test_inertia_pd_check(self):
        with pytest.raises(ValueError):
            qm.QuadrotorParams.create(1.0, -jnp.eye(3, dtype=F64), 1.0, 0.0).validate()
        with pytest.raises(ValueError):
            bad = jnp.asarray([[1.0, 2.0, 0], [0, 1, 0], [0, 0, 1]], F64)
            qm.QuadrotorParams.create(1.0, bad, 1.0, 0.0).validate()
        qm.QuadrotorParams.create(1.0, jnp.eye(3, dtype=F64), 1.0, 0.0).validate()

    def test_moment_arms_layout(self):
        """quadrotor_model.cc:15-18."""
        p = qm.QuadrotorParams.create(1.0, jnp.eye(3, dtype=F64), 2.0, 0.5)
        expected = np.array([[0, -2, 0, 2], [2, 0, -2, 0], [-0.5, 0.5, -0.5, 0.5]])
        np.testing.assert_allclose(np.asarray(qm.moment_arms(p)), expected)
