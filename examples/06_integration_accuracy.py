"""Higher-order integration: substepped Euler and chart RK4.

The reference discretizes with ONE Euler step per stage
(/root/reference/src/quadrotor_model.cc:266-277), which is what makes
aggressive scenarios diverge at coarse dt. This package offers two
drop-in integrator wrappers satisfying the same model protocol
(models/integrators.py):

  * substepped(model, k) — k chained Euler substeps, exact chained
    Jacobians (first order, error ~ dt/k);
  * rk4(model)           — classical RK4 on the exact chart ODE at the
    stage's base point (true 4th order on SE(3)), exact autodiff
    Jacobians of the lifted step.

This example measures one-stage integration error on fast-tumble physics
against a fine reference, then solves the same tracking problem under
Euler, substepped and RK4 discretizations.

Run: python examples/06_integration_accuracy.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)


def main(n=20, dt_s=0.1, max_iters=60):
    import jax.numpy as jnp
    import numpy as np

    from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
    from quadrotorilqr_tpu.lie import se3
    from quadrotorilqr_tpu.models import quadrotor as qm
    from quadrotorilqr_tpu.models.integrators import rk4, substepped
    from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
    from quadrotorilqr_tpu.solver import ILQROptions, Trajectory, solve
    from quadrotorilqr_tpu.solver.options import ConvergenceCriteria

    f64 = jnp.float64
    params = qm.QuadrotorParams.create(
        1.0, jnp.asarray(np.diag([0.01, 0.012, 0.02]), f64), 0.17, 0.016, 9.81
    )

    # --- one-stage integration error on fast-tumble physics ---------------
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = qm.State(
        pose=se3.exp(2.0 * jax.random.normal(k1, (6,), f64)),
        vel=2.0 * jax.random.normal(k2, (6,), f64),
    )
    u = jnp.full((4,), 9.81 / 4.0, f64)
    ref = substepped(qm, 256).discrete_dynamics(params, x, u, 0.15)

    def err(model):
        xn = model.discrete_dynamics(params, x, u, 0.15)
        return float(jnp.linalg.norm(qm.minus(xn, ref)))

    errors = {
        "euler (reference discretization)": err(qm),
        "substepped(4)": err(substepped(qm, 4)),
        "rk4 (same work as substepped(4))": err(rk4(qm)),
    }
    for name, e in errors.items():
        print(f"  one-stage tangent error, {name:36s} {e:.3e}")

    # --- the same solve under each discretization --------------------------
    std = qm.QuadrotorParams.create(
        1.2, jnp.asarray(np.diag([0.4, 0.5, 0.6]) + 0.04, f64), 0.2, 0.016, 9.81
    )
    x0 = qm.State(
        pose=se3.exp(jnp.asarray([0.5, -0.3, 0.8, 0.4, -0.2, 0.3], f64)),
        vel=0.3 * jnp.ones((6,), f64),
    )
    hover = jnp.full((n, 4), 1.2 * 9.81 / 4.0, f64)
    desired = Trajectory(
        times=dt_s * jnp.arange(n, dtype=f64),
        states=qm.State(pose=se3.identity((n,), f64), vel=jnp.zeros((n, 6), f64)),
        controls=hover,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.diag(jnp.asarray([50.0] * 6 + [1.0] * 6, f64)),
        R=jnp.eye(4, dtype=f64),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    traj0 = initial_trajectory_from_state(x0, desired)
    opts = ILQROptions(convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, max_iters))

    results = {}
    for name, model in (
        ("euler", None),
        ("substepped(4)", substepped(qm, 4)),
        ("rk4", rk4(qm)),
    ):
        res = (
            solve(std, cost, traj0, dt_s, opts)
            if model is None
            else solve(std, cost, traj0, dt_s, opts, model=model)
        )
        results[name] = res
        print(
            f"  solve under {name:14s} status={int(res.status)} "
            f"iters={int(res.iterations)} cost={float(res.cost):.4f}"
        )
    return errors, results


if __name__ == "__main__":
    main()
