"""Randomized solve-level parity: JAX engine vs the native C++ oracle.

Stronger than the fixed demo-workload parity test: random physical params,
random SPD inertias, random SE(3) initial states and weights — any
convention drift between the two independent implementations (quaternion
order, tangent layout, Jacobian chain rule, line-search semantics) shows up
as control divergence here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams, State
from quadrotorilqr_tpu.oracle import native
from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
from quadrotorilqr_tpu.solver.ilqr import solve
from quadrotorilqr_tpu.solver.options import ConvergenceCriteria, ILQROptions

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native oracle failed to build"
)

N_CASES = 8
HORIZON = 12
DT = 0.04


def _random_problem(rng):
    mass = rng.uniform(0.5, 2.0)
    a = rng.normal(size=(3, 3))
    inertia = a @ a.T + 3.0 * np.eye(3)
    arm = rng.uniform(0.1, 0.5)
    kappa = rng.uniform(0.0, 0.05)
    q_diag = rng.uniform(0.5, 50.0, size=12)
    r_diag = rng.uniform(0.2, 2.0, size=4)
    tau = 0.3 * rng.normal(size=(1, 6))
    vel0 = 0.2 * rng.normal(size=(1, 6))
    hover = mass * 9.81 / 4.0
    return mass, inertia, arm, kappa, np.diag(q_diag), np.diag(r_diag), tau, vel0, hover


def test_random_solves_match_cpp_oracle():
    rng = np.random.default_rng(42)
    max_err = 0.0
    for case in range(N_CASES):
        mass, inertia, arm, kappa, q, r, tau, vel0, hover = _random_problem(rng)
        dtype = jnp.float64

        desired_states = State(
            pose=se3.identity((HORIZON,), dtype),
            vel=jnp.zeros((HORIZON, 6), dtype),
        )
        desired_u = jnp.full((HORIZON, 4), hover, dtype)
        from quadrotorilqr_tpu.solver.ilqr import Trajectory

        desired = Trajectory(
            times=jnp.arange(HORIZON, dtype=dtype) * DT,
            states=desired_states,
            controls=desired_u,
        )
        x0 = State(
            pose=se3.exp(jnp.asarray(tau, dtype)), vel=jnp.asarray(vel0, dtype)
        )
        init = jax.tree.map(lambda a: a[0], initial_trajectory_from_state(x0, desired))

        params = QuadrotorParams.create(mass, jnp.asarray(inertia, dtype), arm, kappa, 9.81)
        cost = QuadraticTrackingCost(
            Q=jnp.asarray(q, dtype),
            R=jnp.asarray(r, dtype),
            desired_states=desired.states,
            desired_controls=desired.controls,
        )
        options = ILQROptions(
            convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, 15)
        )
        res = solve(params, cost, init, DT, options)

        out = native.solve(
            mass_kg=mass, inertia=inertia, arm_length_m=arm,
            torque_to_thrust_ratio_m=kappa, g_mpss=9.81, q_mat=q, r_mat=r,
            desired_quat=desired.states.pose.quat,
            desired_trans=desired.states.pose.trans,
            desired_vel=desired.states.vel,
            desired_controls=desired.controls,
            init_quat=init.states.pose.quat,
            init_trans=init.states.pose.trans,
            init_vel=init.states.vel,
            init_controls=init.controls,
            dt_s=DT, rtol=1e-10, atol=1e-10, max_iters=15,
        )

        assert int(res.iterations) == out["iterations"], f"case {case}"
        assert int(res.status) == {0: 0, 1: 1, 2: 2}[out["status"]], f"case {case}"
        np.testing.assert_allclose(
            float(res.cost), out["cost"], rtol=1e-8, err_msg=f"case {case}"
        )
        err = np.abs(
            np.asarray(res.trajectory.controls) - out["controls"]
        ).max()
        max_err = max(max_err, float(err))
        np.testing.assert_allclose(
            np.asarray(res.trajectory.controls), out["controls"], atol=1e-6,
            err_msg=f"case {case}",
        )
    # typical agreement is far tighter than the assert tolerance
    assert max_err < 1e-6


def test_random_fused_solves_match_cpp_oracle():
    """The Pallas-kernel solver (interpret mode, f64, auto-padded single
    lane) against the C++ oracle on random problems — ties the kernel math
    directly to the independent native implementation."""
    from quadrotorilqr_tpu.solver.batched import solve_batch_fused
    from quadrotorilqr_tpu.solver.ilqr import Trajectory

    rng = np.random.default_rng(7)
    for case in range(3):
        mass, inertia, arm, kappa, q, r, tau, vel0, hover = _random_problem(rng)
        dtype = jnp.float64
        desired = Trajectory(
            times=jnp.arange(HORIZON, dtype=dtype) * DT,
            states=State(
                pose=se3.identity((HORIZON,), dtype),
                vel=jnp.zeros((HORIZON, 6), dtype),
            ),
            controls=jnp.full((HORIZON, 4), hover, dtype),
        )
        x0 = State(pose=se3.exp(jnp.asarray(tau, dtype)), vel=jnp.asarray(vel0, dtype))
        init_b = initial_trajectory_from_state(x0, desired)  # batch of 1

        params = QuadrotorParams.create(mass, jnp.asarray(inertia, dtype), arm, kappa, 9.81)
        cost = QuadraticTrackingCost(
            Q=jnp.asarray(q, dtype), R=jnp.asarray(r, dtype),
            desired_states=desired.states, desired_controls=desired.controls,
        )
        options = ILQROptions(
            convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, 10)
        )
        res = solve_batch_fused(params, cost, init_b, DT, options, interpret=True)

        init = jax.tree.map(lambda a: a[0], init_b)
        out = native.solve(
            mass_kg=mass, inertia=inertia, arm_length_m=arm,
            torque_to_thrust_ratio_m=kappa, g_mpss=9.81, q_mat=q, r_mat=r,
            desired_quat=desired.states.pose.quat,
            desired_trans=desired.states.pose.trans,
            desired_vel=desired.states.vel,
            desired_controls=desired.controls,
            init_quat=init.states.pose.quat,
            init_trans=init.states.pose.trans,
            init_vel=init.states.vel,
            init_controls=init.controls,
            dt_s=DT, rtol=1e-10, atol=1e-10, max_iters=10,
        )
        assert int(res.iterations[0]) == out["iterations"], f"case {case}"
        np.testing.assert_allclose(
            float(res.cost[0]), out["cost"], rtol=1e-8, err_msg=f"case {case}"
        )
        np.testing.assert_allclose(
            np.asarray(res.trajectory.controls[0]), out["controls"], atol=1e-6,
            err_msg=f"case {case}",
        )


def test_random_streamed_solves_match_cpp_oracle():
    """The STREAMED whole-solve kernel (interpret mode, f64, tail chunks)
    against the C++ oracle on random problems — the fifth independent
    implementation tied directly to the native reference semantics."""
    from quadrotorilqr_tpu.kernels.stream import solve_fused_streamed
    from quadrotorilqr_tpu.solver.ilqr import Trajectory

    rng = np.random.default_rng(21)
    for case in range(2):
        mass, inertia, arm, kappa, q, r, tau, vel0, hover = _random_problem(rng)
        dtype = jnp.float64
        desired = Trajectory(
            times=jnp.arange(HORIZON, dtype=dtype) * DT,
            states=State(
                pose=se3.identity((HORIZON,), dtype),
                vel=jnp.zeros((HORIZON, 6), dtype),
            ),
            controls=jnp.full((HORIZON, 4), hover, dtype),
        )
        x0 = State(pose=se3.exp(jnp.asarray(tau, dtype)), vel=jnp.asarray(vel0, dtype))
        init_1 = initial_trajectory_from_state(x0, desired)  # batch of 1
        # the streamed kernel takes whole 128-lane tiles: replicate the lane
        init_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (128,) + a.shape[1:]), init_1
        )

        params = QuadrotorParams.create(mass, jnp.asarray(inertia, dtype), arm, kappa, 9.81)
        cost = QuadraticTrackingCost(
            Q=jnp.asarray(q, dtype), R=jnp.asarray(r, dtype),
            desired_states=desired.states, desired_controls=desired.controls,
        )
        options = ILQROptions(
            convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, 10)
        )
        traj, cost_v, iters, status = solve_fused_streamed(
            params, cost, init_b, DT, options, interpret=True, chunk=5
        )

        init = jax.tree.map(lambda a: a[0], init_1)
        out = native.solve(
            mass_kg=mass, inertia=inertia, arm_length_m=arm,
            torque_to_thrust_ratio_m=kappa, g_mpss=9.81, q_mat=q, r_mat=r,
            desired_quat=desired.states.pose.quat,
            desired_trans=desired.states.pose.trans,
            desired_vel=desired.states.vel,
            desired_controls=desired.controls,
            init_quat=init.states.pose.quat,
            init_trans=init.states.pose.trans,
            init_vel=init.states.vel,
            init_controls=init.controls,
            dt_s=DT, rtol=1e-10, atol=1e-10, max_iters=10,
        )
        assert int(iters[0]) == out["iterations"], f"case {case}"
        np.testing.assert_allclose(
            float(cost_v[0]), out["cost"], rtol=1e-8, err_msg=f"case {case}"
        )
        np.testing.assert_allclose(
            np.asarray(traj.controls[0]), out["controls"], atol=1e-6,
            err_msg=f"case {case}",
        )
        # every replicated lane must agree exactly with lane 0
        np.testing.assert_array_equal(
            np.asarray(cost_v), np.broadcast_to(np.asarray(cost_v[0]), (128,))
        )
