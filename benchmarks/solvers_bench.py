"""Solver-family comparison: iLQR vs full DDP vs infeasible-start FDDP.

Substantiates the algorithmic claims with measured numbers (float64, CPU by
default — these are ALGORITHM metrics, not chip throughput; bench.py and
benchmarks/run_all.py own the TPU performance numbers):

  * convergence rate (fraction of scenarios ending STATUS_CONVERGED),
  * mean iLQR trips to convergence,
  * for the aggressive-tumble family: how many seeds the exact reference
    loop loses to the diverging iteration-0 feasibility rollout, and how
    many FDDP rescues.

Usage: python benchmarks/solvers_bench.py [--batch 64]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models import quadrotor as qm
from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
from quadrotorilqr_tpu.solver import (
    STATUS_CONVERGED,
    ILQROptions,
    Trajectory,
    solve,
    solve_fddp,
)
from quadrotorilqr_tpu.solver.options import ConvergenceCriteria, LineSearchParams

F64 = jnp.float64

OPTS = ILQROptions(
    line_search_params=LineSearchParams(0.5, 0.5, 40),
    convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 100),
)


def _family(name, batch, seed=0):
    """(params, cost, init_trajs, dt) for a named workload family."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    if name == "benign_hover":
        pose_s, vel_s, dt, n, rw = 0.4, 0.2, 0.05, 40, 1.0
        inertia = np.diag([0.4, 0.5, 0.6]) + 0.05
    elif name == "large_attitude":
        pose_s, vel_s, dt, n, rw = 1.5, 0.3, 0.1, 30, 0.1
        inertia = np.diag([0.4, 0.5, 0.6]) + 0.05
    elif name == "aggressive_tumble":
        pose_s, vel_s, dt, n, rw = 2.0, 2.0, 0.15, 30, 1e-3
        inertia = np.diag([0.01, 0.012, 0.02])
    else:
        raise ValueError(name)
    x0 = qm.State(
        pose=se3.exp(pose_s * jax.random.normal(k1, (batch, 6), F64)),
        vel=vel_s * jax.random.normal(k2, (batch, 6), F64),
    )
    params = qm.QuadrotorParams.create(
        1.0, jnp.asarray(inertia, F64), 0.17, 0.016, 9.81
    )
    hover = jnp.full((n, 4), 9.81 / 4.0, F64)
    desired = Trajectory(
        times=dt * jnp.arange(n, dtype=F64),
        states=qm.State(pose=se3.identity((n,), F64), vel=jnp.zeros((n, 6), F64)),
        controls=hover,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.diag(jnp.asarray([100.0] * 6 + [1.0] * 6, F64)),
        R=rw * jnp.eye(4, dtype=F64),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    return params, cost, initial_trajectory_from_state(x0, desired), dt


def _stats(res):
    status = np.asarray(res.status)
    conv = status == STATUS_CONVERGED
    iters = np.asarray(res.iterations)
    return {
        "converged_pct": 100.0 * conv.mean(),
        "mean_iters": float(iters[conv].mean()) if conv.any() else float("nan"),
        "nan_cost_pct": 100.0 * (~np.isfinite(np.asarray(res.cost))).mean(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    rows = []
    for family in ("benign_hover", "large_attitude", "aggressive_tumble"):
        params, cost, init, dt = _family(family, args.batch)
        runs = {
            "ilqr": jax.vmap(lambda t: solve(params, cost, t, dt, OPTS))(init),
            "ddp": jax.vmap(lambda t: solve(params, cost, t, dt, OPTS, ddp=True))(
                init
            ),
            "fddp": jax.vmap(lambda t: solve_fddp(params, cost, t, dt, OPTS))(init),
            "fddp-ddp": jax.vmap(
                lambda t: solve_fddp(params, cost, t, dt, OPTS, ddp=True)
            )(init),
        }
        for solver, res in runs.items():
            rows.append((family, solver, _stats(res)))

    print(f"\nbatch={args.batch}, f64, tol=1e-9, max 100 trips")
    print(
        f"{'family':<20} {'solver':<8} {'conv %':>7} {'mean iters':>11} {'NaN %':>6}"
    )
    for family, solver, s in rows:
        print(
            f"{family:<20} {solver:<8} {s['converged_pct']:>7.1f} "
            f"{s['mean_iters']:>11.2f} {s['nan_cost_pct']:>6.1f}"
        )


if __name__ == "__main__":
    main()
