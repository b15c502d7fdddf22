"""Generic multirotor model family (models/multirotor.py).

(a) the reference quadrotor is reproduced EXACTLY by the 4-rotor special
case (moment map column-for-column vs quadrotor_model.cc:15-18, dynamics and
Jacobians bitwise-comparable), (b) the analytic Jacobians of a hexarotor
pass the reference's central-FD harness (quadrotor_model_test.cc:30-78,
ported), (c) a hexarotor solves end-to-end on the XLA path AND lane-for-lane
on the fused kernel engines (shared and per-scenario params).
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models import multirotor as mr
from quadrotorilqr_tpu.models import quadrotor as qm
from quadrotorilqr_tpu.models.multirotor import MultirotorParams
from quadrotorilqr_tpu.models.quadrotor import State
from quadrotorilqr_tpu.parallel.batch import (
    initial_trajectory_from_state,
    solve_batch,
)
from quadrotorilqr_tpu.solver import STATUS_CONVERGED, ILQROptions, solve
from quadrotorilqr_tpu.solver.batched import (
    solve_batch_fused,
    solve_batch_latency,
)
from quadrotorilqr_tpu.solver.ilqr import Trajectory
from quadrotorilqr_tpu.solver.options import ConvergenceCriteria

F64 = jnp.float64
DT = 0.03


def _hexa_params(dtype=F64):
    return MultirotorParams.regular(
        6,
        mass_kg=1.6,
        inertia=jnp.asarray(np.diag([0.5, 0.6, 0.7]) + 0.04, dtype),
        arm_length_m=0.35,
        torque_to_thrust_ratio_m=0.02,
        g_mpss=9.81,
    ).validate()


def _random_state(key, scale=0.6):
    k1, k2 = jax.random.split(key)
    return State(
        pose=se3.exp(scale * jax.random.normal(k1, (6,), F64)),
        vel=0.4 * jax.random.normal(k2, (6,), F64),
    )


# ---------------------------------------------------------------------------
# quadrotor special case
# ---------------------------------------------------------------------------


def test_quadrotor_special_case_exact():
    inertia = jnp.asarray(np.diag([0.4, 0.5, 0.6]) + 0.03, F64)
    quad = qm.QuadrotorParams.create(1.3, inertia, 0.25, 0.017, g_mpss=9.81)
    multi = MultirotorParams.quadrotor(1.3, inertia, 0.25, 0.017, g_mpss=9.81)

    np.testing.assert_allclose(
        np.asarray(mr.moment_map(multi)), np.asarray(qm.moment_arms(quad)),
        atol=0.0,
    )

    x = _random_state(jax.random.PRNGKey(0))
    u = jnp.asarray([3.1, 2.8, 3.4, 3.0], F64)
    np.testing.assert_allclose(
        np.asarray(mr.continuous_dynamics(multi, x, u)),
        np.asarray(qm.continuous_dynamics(quad, x, u)),
        atol=1e-15,
    )
    fn_m, jx_m, ju_m = mr.discrete_dynamics_jacobians(multi, x, u, DT)
    fn_q, jx_q, ju_q = qm.discrete_dynamics_jacobians(quad, x, u, DT)
    np.testing.assert_allclose(np.asarray(jx_m), np.asarray(jx_q), atol=1e-15)
    np.testing.assert_allclose(np.asarray(ju_m), np.asarray(ju_q), atol=1e-15)
    np.testing.assert_allclose(
        np.asarray(qm.minus(fn_m, fn_q)), 0.0, atol=1e-15
    )


# ---------------------------------------------------------------------------
# FD Jacobian harness on a hexarotor (quadrotor_model_test.cc:30-78, ported)
# ---------------------------------------------------------------------------


def test_hexarotor_jacobians_finite_difference():
    params = _hexa_params()
    x = _random_state(jax.random.PRNGKey(2))
    u = jnp.asarray(2.0 + np.random.default_rng(3).random(6), F64)
    fn, j_x, j_u = mr.discrete_dynamics_jacobians(params, x, u, DT)
    eps = 1e-6

    for a in range(12):
        e = jnp.zeros((12,), F64).at[a].set(eps)
        fp = mr.discrete_dynamics(params, mr.add(x, e), u, DT)
        fm = mr.discrete_dynamics(params, mr.add(x, -e), u, DT)
        fd = (mr.minus(fp, fn) - mr.minus(fm, fn)) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(fd), np.asarray(j_x[:, a]), atol=1e-6,
            err_msg=f"state axis {a}",
        )

    for a in range(6):
        e = jnp.zeros((6,), F64).at[a].set(eps)
        fp = mr.discrete_dynamics(params, x, u + e, DT)
        fm = mr.discrete_dynamics(params, x, u - e, DT)
        fd = (mr.minus(fp, fn) - mr.minus(fm, fn)) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(fd), np.asarray(j_u[:, a]), atol=1e-6,
            err_msg=f"control axis {a}",
        )


# ---------------------------------------------------------------------------
# end-to-end solves
# ---------------------------------------------------------------------------

N = 10
B = 128
_OPTIONS = ILQROptions(convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 10))


def _hexa_problem(params, batch=None):
    hover = jnp.full((N, 6), float(params.mass_kg.reshape(-1)[0]) * 9.81 / 6.0, F64)
    desired = Trajectory(
        times=jnp.arange(N, dtype=F64) * DT,
        states=State(pose=se3.identity((N,), F64), vel=jnp.zeros((N, 6), F64)),
        controls=hover,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.asarray(np.diag([100.0] * 6 + [1.0] * 6), F64),
        R=jnp.eye(6, dtype=F64),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    rng = np.random.default_rng(9)
    shape = (batch, 6) if batch else (6,)
    x0 = State(
        pose=se3.exp(jnp.asarray(0.25 * rng.normal(size=shape), F64)),
        vel=jnp.asarray(0.2 * rng.normal(size=shape), F64),
    )
    return cost, initial_trajectory_from_state(x0, desired)


def test_hexarotor_solve_xla():
    params = _hexa_params()
    cost, traj0 = _hexa_problem(params)
    opts = ILQROptions(convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, 50))
    res = solve(params, cost, traj0, DT, opts, model=mr)
    assert int(res.status) == STATUS_CONVERGED
    assert res.trajectory.controls.shape == (N, 6)


def _assert_same(a, b, atol=1e-8):
    np.testing.assert_allclose(np.asarray(a.cost), np.asarray(b.cost), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(a.trajectory.controls),
        np.asarray(b.trajectory.controls),
        atol=atol,
    )
    assert (np.asarray(a.status) == np.asarray(b.status)).all()
    assert (np.asarray(a.iterations) == np.asarray(b.iterations)).all()


def test_hexarotor_kernel_parity_shared_params():
    """Hexarotor on the fused engines (f64 interpret) vs the vmapped XLA
    solver: lane-for-lane."""
    params = _hexa_params()
    cost, init = _hexa_problem(params, batch=B)
    ref = solve_batch(params, cost, init, DT, _OPTIONS, model=mr)
    f = solve_batch_fused(
        params, cost, init, DT, _OPTIONS, interpret=True, model=mr
    )
    _assert_same(f, ref)
    w = solve_batch_latency(
        params, cost, init, DT, _OPTIONS, interpret=True, model=mr
    )
    _assert_same(w, f, atol=1e-10)


def test_hexarotor_kernel_parity_per_scenario_params():
    """Monte-Carlo hexarotor params (mass/inertia/kappa per scenario) on the
    fused engines."""
    rng = np.random.default_rng(23)
    base = _hexa_params()
    mass = jnp.asarray(1.2 + 0.6 * rng.random(B), F64)
    inert = jnp.asarray(
        np.stack([np.diag(0.4 + 0.3 * rng.random(3)) + 0.03 for _ in range(B)]),
        F64,
    )
    kappa = jnp.asarray(0.01 + 0.02 * rng.random(B), F64)
    params = MultirotorParams(
        mass_kg=mass,
        inertia=inert,
        rotor_positions_m=jnp.broadcast_to(
            base.rotor_positions_m, (B, 6, 3)
        ),
        rotor_spin=jnp.broadcast_to(base.rotor_spin, (B, 6)),
        torque_to_thrust_ratio_m=kappa,
        g_mpss=jnp.full((B,), 9.81, F64),
    )
    cost, init = _hexa_problem(base, batch=B)
    ref = solve_batch(
        params, cost, init, DT, _OPTIONS, params_batched=True, model=mr
    )
    f = solve_batch_fused(
        params, cost, init, DT, _OPTIONS, interpret=True, model=mr
    )
    _assert_same(f, ref)
