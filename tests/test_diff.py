"""Differentiable solve (solver/diff.solve_implicit): IFT gradients vs
central finite differences of the ENTIRE solve.

Every path is exercised: the envelope theorem (cost output), the IFT/CG
linear solve (control outputs), and the rollout pullback (state outputs),
for each differentiable input family (cost weights, desired trajectory,
physical params, initial state). f64, tight tolerance — gradients are
exact only at a stationary point.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams, State
from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
from quadrotorilqr_tpu.solver.diff import solve_implicit
from quadrotorilqr_tpu.solver.ilqr import Trajectory, solve
from quadrotorilqr_tpu.solver.options import (
    ConvergenceCriteria,
    ILQROptions,
)

DT = 0.05
N = 8
DTYPE = jnp.float64

_OPTIONS = ILQROptions(
    convergence_criteria=ConvergenceCriteria(1e-13, 1e-13, 60)
)


def _problem(seed=0):
    rng = np.random.default_rng(seed)
    params = QuadrotorParams.create(
        mass_kg=1.2,
        inertia=jnp.asarray(np.diag([0.4, 0.5, 0.6]) + 0.05, DTYPE),
        arm_length_m=0.25,
        torque_to_thrust_ratio_m=0.02,
        g_mpss=9.81,
    )
    hover = jnp.full((N, 4), 1.2 * 9.81 / 4.0, DTYPE)
    desired = Trajectory(
        times=jnp.arange(N, dtype=DTYPE) * DT,
        states=State(
            pose=se3.identity((N,), DTYPE), vel=jnp.zeros((N, 6), DTYPE)
        ),
        controls=hover,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.asarray(np.diag([80.0] * 6 + [1.5] * 6), DTYPE),
        R=jnp.eye(4, dtype=DTYPE),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    x0 = State(
        pose=se3.exp(jnp.asarray(0.15 * rng.normal(size=(1, 6)), DTYPE)),
        vel=jnp.asarray(0.1 * rng.normal(size=(1, 6)), DTYPE),
    )
    init = jax.tree.map(
        lambda a: a[0], initial_trajectory_from_state(x0, desired)
    )
    return params, cost, init


def _loss(res):
    """Touches all three output families: controls (IFT/CG), states
    (rollout pullback), and the cost value (envelope)."""
    final = jax.tree.map(lambda a: a[-1], res.trajectory.states)
    return (
        jnp.sum(res.trajectory.controls**2)
        + 10.0 * jnp.sum(final.pose.trans**2)
        + 0.01 * res.cost
    )


def _fd(f, x, eps=1e-6):
    """Central FD derivative of scalar f at scalar x."""
    return (f(x + eps) - f(x - eps)) / (2 * eps)


def test_grad_matches_fd_all_input_families():
    params, cost, init = _problem()

    def loss_of(p, c, t):
        return _loss(solve_implicit(p, c, t, DT, _OPTIONS))

    g_params, g_cost, g_traj = jax.grad(loss_of, argnums=(0, 1, 2))(
        params, cost, init
    )

    def full_solve_loss(p, c, t):
        return float(_loss(solve(p, c, t, DT, _OPTIONS)))

    # physical param: mass
    fd_mass = _fd(
        lambda m: full_solve_loss(
            QuadrotorParams.create(
                mass_kg=m,
                inertia=params.inertia,
                arm_length_m=params.arm_length_m,
                torque_to_thrust_ratio_m=params.torque_to_thrust_ratio_m,
                g_mpss=params.g_mpss,
            ),
            cost,
            init,
        ),
        1.2,
    )
    np.testing.assert_allclose(
        float(g_params.mass_kg), fd_mass, rtol=2e-4, err_msg="d/d mass"
    )

    # cost weight: Q[2, 2] (z tracking)
    fd_q = _fd(
        lambda q: full_solve_loss(
            params,
            QuadraticTrackingCost(
                Q=cost.Q.at[2, 2].set(q),
                R=cost.R,
                desired_states=cost.desired_states,
                desired_controls=cost.desired_controls,
            ),
            init,
        ),
        80.0,
        eps=1e-4,
    )
    np.testing.assert_allclose(
        float(g_cost.Q[2, 2]), fd_q, rtol=2e-4, err_msg="d/d Q[2,2]"
    )

    # desired trajectory: z-translation of stage 4
    fd_des = _fd(
        lambda z: full_solve_loss(
            params,
            QuadraticTrackingCost(
                Q=cost.Q,
                R=cost.R,
                desired_states=State(
                    pose=type(cost.desired_states.pose)(
                        quat=cost.desired_states.pose.quat,
                        trans=cost.desired_states.pose.trans.at[4, 2].set(z),
                    ),
                    vel=cost.desired_states.vel,
                ),
                desired_controls=cost.desired_controls,
            ),
            init,
        ),
        0.0,
        eps=1e-5,
    )
    np.testing.assert_allclose(
        float(g_cost.desired_states.pose.trans[4, 2]),
        fd_des,
        rtol=2e-4,
        err_msg="d/d desired z",
    )

    # initial state: velocity component 1
    fd_x0 = _fd(
        lambda v: full_solve_loss(
            params,
            cost,
            Trajectory(
                times=init.times,
                states=State(
                    pose=init.states.pose,
                    vel=init.states.vel.at[0, 1].set(v),
                ),
                controls=init.controls,
            ),
        ),
        float(init.states.vel[0, 1]),
        eps=1e-6,
    )
    np.testing.assert_allclose(
        float(g_traj.states.vel[0, 1]), fd_x0, rtol=2e-4, err_msg="d/d x0"
    )
    # the rest of the initialization must carry zero gradient
    assert float(jnp.abs(g_traj.controls).max()) == 0.0
    assert float(jnp.abs(g_traj.states.vel[1:]).max()) == 0.0


def test_grad_vmaps_over_scenarios():
    """The custom-vjp solve composes with vmap + jit (batched learning)."""
    params, cost, init = _problem()
    batch = 3
    rng = np.random.default_rng(5)
    x0 = State(
        pose=se3.exp(jnp.asarray(0.1 * rng.normal(size=(batch, 6)), DTYPE)),
        vel=jnp.asarray(0.1 * rng.normal(size=(batch, 6)), DTYPE),
    )
    desired = Trajectory(
        times=init.times, states=cost.desired_states,
        controls=cost.desired_controls,
    )
    init_b = initial_trajectory_from_state(x0, desired)

    @jax.jit
    def batch_loss(q_diag):
        c = QuadraticTrackingCost(
            Q=jnp.diag(q_diag),
            R=cost.R,
            desired_states=cost.desired_states,
            desired_controls=cost.desired_controls,
        )
        res = jax.vmap(
            lambda t: solve_implicit(params, c, t, DT, _OPTIONS)
        )(init_b)
        return jnp.sum(res.trajectory.controls**2)

    q0 = jnp.asarray([80.0] * 6 + [1.5] * 6, DTYPE)
    g = jax.grad(batch_loss)(q0)
    assert np.isfinite(np.asarray(g)).all()

    eps = 1e-4
    e = jnp.zeros_like(q0).at[2].set(eps)
    fd = (float(batch_loss(q0 + e)) - float(batch_loss(q0 - e))) / (2 * eps)
    np.testing.assert_allclose(float(g[2]), fd, rtol=2e-4)


def test_grad_wrench_model():
    """Model-generic: gradients through the SE(3)-wrench solve."""
    from quadrotorilqr_tpu.models import se3_wrench as wm
    from quadrotorilqr_tpu.models.se3_wrench import WrenchParams

    rng = np.random.default_rng(9)
    params = WrenchParams.create(
        mass_kg=1.4,
        inertia=jnp.asarray(np.diag([0.5, 0.6, 0.7]) + 0.04, DTYPE),
        g_mpss=9.81,
    )
    hover = jnp.zeros((N, 6), DTYPE).at[:, 2].set(1.4 * 9.81)
    desired = Trajectory(
        times=jnp.arange(N, dtype=DTYPE) * DT,
        states=State(
            pose=se3.identity((N,), DTYPE), vel=jnp.zeros((N, 6), DTYPE)
        ),
        controls=hover,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.asarray(np.diag([80.0] * 6 + [1.5] * 6), DTYPE),
        R=jnp.eye(6, dtype=DTYPE),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    x0 = State(
        pose=se3.exp(jnp.asarray(0.15 * rng.normal(size=(1, 6)), DTYPE)),
        vel=jnp.asarray(0.1 * rng.normal(size=(1, 6)), DTYPE),
    )
    init = jax.tree.map(
        lambda a: a[0], initial_trajectory_from_state(x0, desired)
    )

    def loss_of(m):
        p = WrenchParams.create(
            mass_kg=m, inertia=params.inertia, g_mpss=params.g_mpss
        )
        return _loss(solve_implicit(p, cost, init, DT, _OPTIONS, wm))

    g = jax.grad(loss_of)(jnp.asarray(1.4, DTYPE))

    def fd_loss(m):
        p = WrenchParams.create(
            mass_kg=m, inertia=params.inertia, g_mpss=params.g_mpss
        )
        return float(_loss(solve(p, cost, init, DT, _OPTIONS, model=wm)))

    fd = (fd_loss(1.4 + 1e-6) - fd_loss(1.4 - 1e-6)) / 2e-6
    np.testing.assert_allclose(float(g), fd, rtol=2e-4)
