"""Constrained trajectory optimization: obstacles, envelopes, rotor limits.

The reference solver is unconstrained; this package adds (a) exact control
boxes (`solver.solve_box`, also inside the fused kernels) and (b) general
nonlinear state/control inequalities via the augmented-Lagrangian solver
(`solver.solve_auglag` + the `solver.constraints` builders). This example
flies through a field of constraints: a keep-out sphere on the straight
path, a no-fly cylinder, a tilt envelope, and rotor thrust limits.

Run: python examples/03_constrained_flight.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)


def main(n=20, dt_s=0.1):
    import jax.numpy as jnp
    import numpy as np

    from quadrotorilqr_tpu.costs import QuadraticTrackingCost
    from quadrotorilqr_tpu.lie import se3
    from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams, State
    from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
    from quadrotorilqr_tpu.solver import (
        ALOptions,
        Trajectory,
        constraints as C,
        solve_auglag,
    )
    from quadrotorilqr_tpu.solver.options import ConvergenceCriteria, ILQROptions

    f64 = jnp.float64
    params = QuadrotorParams.create(1.0, jnp.eye(3, dtype=f64), 0.25, 0.02, 9.81)
    target = jnp.asarray([2.0, 0.0, 0.0], f64)
    desired = Trajectory(
        times=dt_s * jnp.arange(n, dtype=f64),
        states=State(
            pose=se3.SE3(
                quat=jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0], f64), (n, 4)),
                trans=jnp.broadcast_to(target, (n, 3)),
            ),
            vel=jnp.zeros((n, 6), f64),
        ),
        controls=jnp.full((n, 4), 9.81 / 4.0, f64),
    )
    cost = QuadraticTrackingCost(
        Q=jnp.asarray(np.diag([60.0] * 6 + [1.0] * 6), f64),
        R=0.5 * jnp.eye(4, dtype=f64),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    x0 = State(pose=se3.identity((), f64), vel=jnp.zeros((6,), f64))
    init = initial_trajectory_from_state(
        jax.tree.map(lambda a: a[None], x0), desired
    )
    init = jax.tree.map(lambda a: a[0], init)

    con = C.combine(
        C.sphere_keepout(center=[1.0, 0.0, 0.0], radius=0.35),
        C.tilt_limit(0.6),
        C.altitude_band(-0.3, 1.0),
        C.control_box(0.0, 6.0),
    )
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, 60)
    )
    res = solve_auglag(
        params, cost, con, init, dt_s, options,
        ALOptions(constraint_tol=1e-7, max_outer_iters=12),
    )
    print(f"status: {int(res.status)} (1=converged, 3=feasible-at-budget)")
    print(f"max violation: {float(res.max_violation):.2e}")
    print(f"outer (multiplier) iterations: {int(res.outer_iterations)}")
    trans = np.asarray(res.trajectory.states.pose.trans)
    d_obs = np.linalg.norm(trans - np.array([1.0, 0.0, 0.0]), axis=-1).min()
    print(f"closest approach to the obstacle: {d_obs:.3f} m (radius 0.35)")
    return res


if __name__ == "__main__":
    main()
