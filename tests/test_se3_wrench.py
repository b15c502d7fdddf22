"""Second model family: fully-actuated SE(3) body wrench (models/se3_wrench)
and the solver's model-genericity (the reference's `template <class ModelT>`,
ilqr.hh:25 — here `solve(..., model=<module>)`).

Validation strategy mirrors the quadrotor model's (SURVEY.md §4): central
finite differences against the analytic Jacobians, jax.jacfwd cross-check,
and — stronger than anything the reference has — an exact reduction test
pinning this model to the quadrotor one under the rotor->wrench map.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models import quadrotor as qm
from quadrotorilqr_tpu.models import se3_wrench as wm
from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams, State
from quadrotorilqr_tpu.models.se3_wrench import WrenchParams, wrench_from_rotors

DT = 0.03


def _params(dtype=jnp.float64):
    return WrenchParams.create(
        mass_kg=1.4,
        inertia=jnp.asarray(np.diag([0.5, 0.6, 0.7]) + 0.04, dtype),
        g_mpss=9.81,
    )


def _state(rng, dtype=jnp.float64):
    tau = jnp.asarray(0.4 * rng.normal(size=6), dtype)
    vel = jnp.asarray(0.5 * rng.normal(size=6), dtype)
    return State(pose=se3.exp(tau), vel=vel)


def test_discrete_jacobians_match_finite_differences():
    rng = np.random.default_rng(0)
    params = _params()
    x = _state(rng)
    u = jnp.asarray(rng.normal(size=6), jnp.float64)
    _, j_x, j_u = wm.discrete_dynamics_jacobians(params, x, u, DT)

    eps = 1e-6
    # state perturbations along each of the 12 tangent axes
    for a in range(12):
        d = jnp.zeros(12, jnp.float64).at[a].set(eps)
        xp = wm.discrete_dynamics(params, qm.add(x, d), u, DT)
        xm = wm.discrete_dynamics(params, qm.add(x, -d), u, DT)
        fd = qm.minus(xp, xm) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(j_x[:, a]), np.asarray(fd), atol=2e-6,
            err_msg=f"state axis {a}",
        )
    for a in range(6):
        d = jnp.zeros(6, jnp.float64).at[a].set(eps)
        xp = wm.discrete_dynamics(params, x, u + d, DT)
        xm = wm.discrete_dynamics(params, x, u - d, DT)
        fd = qm.minus(xp, xm) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(j_u[:, a]), np.asarray(fd), atol=2e-6,
            err_msg=f"control axis {a}",
        )


def test_continuous_jacobians_match_autodiff():
    rng = np.random.default_rng(1)
    params = _params()
    x = _state(rng)
    u = jnp.asarray(rng.normal(size=6), jnp.float64)
    _, _, j_u = wm.continuous_dynamics_jacobians(params, x, u)
    j_u_ad = jax.jacfwd(lambda uu: wm.continuous_dynamics(params, x, uu))(u)
    np.testing.assert_allclose(np.asarray(j_u), np.asarray(j_u_ad), atol=1e-12)


def test_reduces_exactly_to_quadrotor_under_rotor_map():
    """f=[0,0,sum u], tau=MA@u makes the wrench model the quadrotor model."""
    rng = np.random.default_rng(2)
    qparams = QuadrotorParams.create(
        mass_kg=1.4,
        inertia=jnp.asarray(np.diag([0.5, 0.6, 0.7]) + 0.04, jnp.float64),
        arm_length_m=0.23,
        torque_to_thrust_ratio_m=0.014,
        g_mpss=9.81,
    )
    wparams = WrenchParams.create(1.4, qparams.inertia, 9.81)
    for _ in range(4):
        x = _state(rng)
        u_rotor = jnp.asarray(rng.normal(size=4) + 3.0, jnp.float64)
        u_wrench = wrench_from_rotors(qparams, u_rotor)
        xq = qm.discrete_dynamics(qparams, x, u_rotor, DT)
        xw = wm.discrete_dynamics(wparams, x, u_wrench, DT)
        np.testing.assert_allclose(
            np.asarray(qm.minus(xq, xw)), 0.0, atol=1e-13
        )


def test_generic_solve_converges_on_waypoint():
    """Full iLQR with model=se3_wrench (6 controls): recover a waypoint
    from a perturbed start; solver/cost layers are control-dim-agnostic."""
    from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
    from quadrotorilqr_tpu.solver.ilqr import Trajectory, solve
    from quadrotorilqr_tpu.solver.options import (
        ConvergenceCriteria,
        ILQROptions,
    )
    from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost

    dtype = jnp.float64
    n = 30
    params = _params(dtype)
    # hover wrench: f_z = m g, zero torque
    hover = jnp.zeros((n, 6), dtype).at[:, 2].set(
        params.mass_kg * params.g_mpss
    )
    desired = Trajectory(
        times=jnp.arange(n, dtype=dtype) * DT,
        states=State(
            pose=se3.identity((n,), dtype), vel=jnp.zeros((n, 6), dtype)
        ),
        controls=hover,
    )
    rng = np.random.default_rng(3)
    x0 = State(
        pose=se3.exp(jnp.asarray(0.3 * rng.normal(size=(1, 6)), dtype)),
        vel=jnp.asarray(0.2 * rng.normal(size=(1, 6)), dtype),
    )
    init = jax.tree.map(
        lambda a: a[0], initial_trajectory_from_state(x0, desired)
    )
    cost = QuadraticTrackingCost(
        Q=jnp.asarray(np.diag([100.0] * 6 + [1.0] * 6), dtype),
        R=jnp.eye(6, dtype=dtype),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, 30)
    )
    res = solve(params, cost, init, DT, options, model=wm)
    assert int(res.status) == 1, "wrench-model solve must converge"
    # terminal POSE near the waypoint (fully actuated: tight tracking).
    # Terminal velocity is a free endpoint — the last stages' velocity has
    # no post-horizon consequence, so iLQR rightly leaves it loose.
    err = qm.minus(
        jax.tree.map(lambda a: a[-1], res.trajectory.states),
        jax.tree.map(lambda a: a[-1], desired.states),
    )
    assert float(jnp.abs(err[0:6]).max()) < 0.2
    assert res.trajectory.controls.shape == (n, 6)

    # the vmapped batch path is generic too
    from quadrotorilqr_tpu.parallel.batch import solve_batch

    x0b = State(
        pose=se3.exp(jnp.asarray(0.2 * rng.normal(size=(3, 6)), dtype)),
        vel=jnp.asarray(0.1 * rng.normal(size=(3, 6)), dtype),
    )
    init_b = initial_trajectory_from_state(x0b, desired)
    res_b = solve_batch(params, cost, init_b, DT, options, model=wm)
    assert res_b.trajectory.controls.shape == (3, n, 6)
    assert (np.asarray(res_b.status) == 1).all()

    # the associative backward pass is model-generic too (was hardcoded to
    # the quadrotor's 4 controls via jnp.eye(4))
    res_a = solve(params, cost, init, DT, options, associative=True, model=wm)
    assert int(res_a.status) == 1
    np.testing.assert_allclose(
        np.asarray(res_a.trajectory.controls),
        np.asarray(res.trajectory.controls),
        atol=1e-6,
    )
