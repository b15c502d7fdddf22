"""Gradients THROUGH the solver: tune cost weights by gradient descent.

`solver.solve_implicit` differentiates the converged iLQR solution with
respect to anything — Q/R weights, the desired trajectory, physical
parameters, the initial state — via the implicit function theorem (the
reference's C++ solver is structurally incapable of this). Here: tune the
log-diagonal of Q so the OPTIMIZED trajectory's terminal position matches
a target, using plain gradient descent on a scalar loss.

Run: python examples/04_differentiable_tuning.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)


def main(n=12, dt_s=0.1, steps=8):
    import jax.numpy as jnp
    import numpy as np

    from quadrotorilqr_tpu.app import workloads
    from quadrotorilqr_tpu.costs import QuadraticTrackingCost
    from quadrotorilqr_tpu.lie import se3
    from quadrotorilqr_tpu.models.quadrotor import State
    from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
    from quadrotorilqr_tpu.solver import Trajectory, solve_implicit
    from quadrotorilqr_tpu.solver.options import ConvergenceCriteria, ILQROptions

    f64 = jnp.float64
    params = workloads.demo_params(f64)
    hover = jnp.full((n, 4), 9.81 / 4.0, f64)
    desired = Trajectory(
        times=dt_s * jnp.arange(n, dtype=f64),
        states=State(pose=se3.identity((n,), f64), vel=jnp.zeros((n, 6), f64)),
        controls=hover,
    )
    x0 = State(
        pose=se3.exp(jnp.asarray([0.5, 0.3, 0.0, 0, 0, 0], f64)),
        vel=jnp.zeros((6,), f64),
    )
    init = jax.tree.map(
        lambda a: a[0],
        initial_trajectory_from_state(jax.tree.map(lambda a: a[None], x0), desired),
    )
    options = ILQROptions(convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, 40))
    target_final = jnp.zeros((3,), f64)  # want the quad back at the origin

    def loss(log_q_diag):
        cost = QuadraticTrackingCost(
            Q=jnp.diag(jnp.exp(log_q_diag)),
            R=jnp.eye(4, dtype=f64),
            desired_states=desired.states,
            desired_controls=desired.controls,
        )
        res = solve_implicit(params, cost, init, dt_s, options)
        final_pos = res.trajectory.states.pose.trans[-1]
        return jnp.sum((final_pos - target_final) ** 2)

    log_q = jnp.log(jnp.asarray([10.0] * 6 + [1.0] * 6, f64))
    val_grad = jax.jit(jax.value_and_grad(loss))
    for i in range(steps):
        v, g = val_grad(log_q)
        log_q = log_q - 0.5 * g
        print(f"step {i}: terminal-error loss {float(v):.6f}")
    print("tuned Q diag:", np.round(np.exp(np.asarray(log_q)), 3))
    return log_q


if __name__ == "__main__":
    main()
