"""Robust constrained flight: FDDP inner loops under the AL penalty.

The exact-loop AL inner solver (examples/03) inherits the reference
loop's weakness: its unconditional iteration-0 rollout diverges on
tumbling starts (the class `solve_fddp` exists for — examples/05). Round
5 composes the two: `solve_auglag(robust=True)` runs the multiple-
shooting FDDP loop on each PHR subproblem — the penalty value folds into
every Goldstein line-search candidate and the penalty quadratics
(including the C_xu cross term) into the gap-transported backward pass.

This example takes an aggressive tumbling start next to a keep-out
sphere and shows the exact inner loop stalling where the robust one
converges to a feasible optimum.

Run: python examples/08_robust_constrained.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)


def main(n=10, dt_s=0.12, hard_scale=2.2):
    import jax.numpy as jnp
    import numpy as np

    from quadrotorilqr_tpu.costs import QuadraticTrackingCost
    from quadrotorilqr_tpu.lie import se3
    from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams, State
    from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
    from quadrotorilqr_tpu.solver import ILQROptions, Trajectory
    from quadrotorilqr_tpu.solver import constraints as C
    from quadrotorilqr_tpu.solver.auglag import ALOptions, solve_auglag
    from quadrotorilqr_tpu.solver.options import (
        ConvergenceCriteria,
        LineSearchParams,
    )

    f64 = jnp.float64
    params = QuadrotorParams.create(
        1.0, jnp.asarray(np.diag([0.01, 0.012, 0.02]), f64), 0.17, 0.016,
        9.81,
    )
    # an aggressive tumbling start (the exact-loop divergence class)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x0 = State(
        pose=se3.exp(hard_scale * jax.random.normal(k1, (6,), f64)),
        vel=hard_scale * jax.random.normal(k2, (6,), f64),
    )
    hover = jnp.full((n, 4), 9.81 / 4.0, f64)
    desired = Trajectory(
        times=dt_s * jnp.arange(n, dtype=f64),
        states=State(
            pose=se3.identity((n,), f64), vel=jnp.zeros((n, 6), f64)
        ),
        controls=hover,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.diag(jnp.asarray([100.0] * 6 + [1.0] * 6, f64)),
        R=1e-3 * jnp.eye(4, dtype=f64),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    traj0 = initial_trajectory_from_state(x0, desired)
    sphere = C.sphere_keepout(center=[0.3, 0.0, 0.0], radius=0.15)
    opts = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 25),
    )
    alo = ALOptions(max_outer_iters=4)

    r_std = solve_auglag(params, cost, sphere, traj0, dt_s, opts, alo)
    r_rob = solve_auglag(
        params, cost, sphere, traj0, dt_s, opts, alo, robust=True
    )
    print("— aggressive tumbling start beside a keep-out sphere —")
    print(
        f"exact inner loop : status {int(r_std.status)}, "
        f"cost {float(r_std.cost):.4g}, "
        f"violation {float(r_std.max_violation):.2e}"
    )
    print(
        f"robust (FDDP)    : status {int(r_rob.status)}, "
        f"cost {float(r_rob.cost):.4g}, "
        f"violation {float(r_rob.max_violation):.2e}"
    )
    assert float(r_rob.cost) <= 1.001 * float(r_std.cost)
    return r_rob


if __name__ == "__main__":
    main()
