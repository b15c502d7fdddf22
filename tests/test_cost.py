"""Cost function tests — mirrors /root/reference/src/cost_test.cc:
zero cost at zero error (:27-39), FD gradient checks (:66-124), and loose
Gauss-Newton Hessian checks (:83-151); plus autodiff cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.costs import quadratic as qc
from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models import quadrotor as qm

F64 = jnp.float64
N = 5


def make_traj(seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    taus = scale * rng.normal(size=(N, 6))
    states = qm.State(
        pose=se3.exp(jnp.asarray(taus, F64)),
        vel=jnp.asarray(scale * rng.normal(size=(N, 6)), F64),
    )
    controls = jnp.asarray(scale * rng.normal(size=(N, 4)), F64)
    return states, controls


def make_cost(seed=1):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(12, 12))
    q = jnp.asarray(a @ a.T + 12 * np.eye(12), F64)
    b = rng.normal(size=(4, 4))
    r = jnp.asarray(b @ b.T + 4 * np.eye(4), F64)
    states, controls = make_traj(seed + 10)
    return qc.QuadraticTrackingCost(Q=q, R=r, desired_states=states, desired_controls=controls)


def state_at(states, i):
    return jax.tree.map(lambda leaf: leaf[i], states)


class TestCost:
    def test_zero_cost_on_desired(self):
        cost = make_cost()
        for i in range(N):
            j = qc.stage_cost(cost, state_at(cost.desired_states, i), cost.desired_controls[i], i)
            assert abs(float(j)) < 1e-14

    def test_trajectory_cost_matches_stage_sum(self):
        cost = make_cost(2)
        states, controls = make_traj(3)
        total = qc.trajectory_cost(cost, states, controls)
        stage_sum = sum(
            float(qc.stage_cost(cost, state_at(states, i), controls[i], i)) for i in range(N)
        )
        np.testing.assert_allclose(float(total), stage_sum, rtol=1e-13)

    def test_cost_positive(self):
        cost = make_cost(4)
        states, controls = make_traj(5)
        assert float(qc.trajectory_cost(cost, states, controls)) > 0

    def test_gradients_autodiff(self):
        """C_x along the group perturbation, C_u plain (cost_test.cc:66-124)."""
        cost = make_cost(6)
        states, controls = make_traj(7)
        i = 2
        x, u = state_at(states, i), controls[i]
        x_d, u_d = qc.gather_stage(cost, i)
        _, c_x, c_u, c_xx, c_uu = qc.stage_cost_with_diffs(cost, x, u, x_d, u_d)

        grad_x = jax.grad(lambda d: qc.stage_cost(cost, qm.add(x, d), u, i))(jnp.zeros(12, F64))
        grad_u = jax.grad(lambda uu: qc.stage_cost(cost, x, uu, i))(u)
        np.testing.assert_allclose(np.asarray(c_x), np.asarray(grad_x), rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(c_u), np.asarray(grad_u), rtol=1e-9, atol=1e-11)

    def test_uu_hessian_exact(self):
        cost = make_cost(8)
        states, controls = make_traj(9)
        i = 1
        x, u = state_at(states, i), controls[i]
        x_d, u_d = qc.gather_stage(cost, i)
        _, _, _, _, c_uu = qc.stage_cost_with_diffs(cost, x, u, x_d, u_d)
        hess_u = jax.hessian(lambda uu: qc.stage_cost(cost, x, uu, i))(u)
        np.testing.assert_allclose(np.asarray(c_uu), np.asarray(hess_u), rtol=1e-10, atol=1e-12)

    def test_xx_hessian_gauss_newton(self):
        """The reference deliberately drops the curvature of (-) (cost.hh:52);
        like cost_test.cc:83-107 we only require H^-1 H_true ~ I loosely."""
        cost = make_cost(10)
        states, controls = make_traj(11, scale=0.1)  # small residual -> GN accurate
        i = 3
        x, u = state_at(states, i), controls[i]
        x_d, u_d = qc.gather_stage(cost, i)
        _, _, _, c_xx, _ = qc.stage_cost_with_diffs(cost, x, u, x_d, u_d)
        hess_x = jax.hessian(lambda d: qc.stage_cost(cost, qm.add(x, d), u, i))(jnp.zeros(12, F64))
        prod = np.linalg.solve(np.asarray(c_xx), np.asarray(hess_x))
        assert np.linalg.norm(prod - np.eye(12)) < 1.0  # loose, GN approx

    def test_batched_cost(self):
        cost = make_cost(12)
        states, controls = make_traj(13)
        b_states = jax.tree.map(lambda leaf: jnp.stack([leaf, leaf]), states)
        b_controls = jnp.stack([controls, controls])
        total = jax.vmap(lambda s, c: qc.trajectory_cost(cost, s, c))(b_states, b_controls)
        single = qc.trajectory_cost(cost, states, controls)
        np.testing.assert_allclose(np.asarray(total), np.full(2, float(single)), rtol=1e-13)
