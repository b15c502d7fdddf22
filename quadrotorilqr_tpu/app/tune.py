"""Gradient-based cost tuning through the differentiable solve.

End-to-end demonstration of `solver.solve_implicit` (solver/diff.py): find
cost weights Q whose OPTIMAL trajectories best satisfy a task-level
objective the solver never sees. Here: the quadrotor must reach a waypoint
but the task loss additionally charges for control effort and terminal
velocity — the tuner backpropagates through the iLQR solution to adjust
the 12 diagonal tracking weights, batched over randomized initial poses.

This closes a loop the reference cannot express (its solver is an opaque
C++ binary): cost tuning there is manual. Run:

    python -m quadrotorilqr_tpu.app.tune [--steps 40] [--batch 8]

Prints the task loss per optimization step and the final weights. CPU-
friendly sizes by default; everything jits and scales on TPU.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..costs.quadratic import QuadraticTrackingCost
from ..lie import se3
from ..models.quadrotor import QuadrotorParams, State
from ..parallel.batch import initial_trajectory_from_state
from ..solver.diff import solve_implicit
from ..solver.ilqr import Trajectory
from ..solver.options import ConvergenceCriteria, ILQROptions

DT = 0.05
N = 16


def build_problem(batch, dtype=jnp.float64, seed=0):
    params = QuadrotorParams.create(
        mass_kg=1.0,
        inertia=jnp.eye(3, dtype=dtype),
        arm_length_m=0.2,
        torque_to_thrust_ratio_m=0.016,
        g_mpss=9.81,
    )
    hover = jnp.full((N, 4), 9.81 / 4.0, dtype)
    target = jnp.asarray([1.0, 0.5, 1.5], dtype)
    desired = Trajectory(
        times=jnp.arange(N, dtype=dtype) * DT,
        states=State(
            pose=se3.SE3(
                quat=jnp.broadcast_to(
                    jnp.asarray([1.0, 0, 0, 0], dtype), (N, 4)
                ),
                trans=jnp.broadcast_to(target, (N, 3)),
            ),
            vel=jnp.zeros((N, 6), dtype),
        ),
        controls=hover,
    )
    rng = np.random.default_rng(seed)
    x0 = State(
        pose=se3.exp(jnp.asarray(0.2 * rng.normal(size=(batch, 6)), dtype)),
        vel=jnp.asarray(0.1 * rng.normal(size=(batch, 6)), dtype),
    )
    return params, desired, target, initial_trajectory_from_state(x0, desired)


def task_loss(res, target):
    """What we actually care about (never handed to the solver): reach the
    waypoint at the end, arrive calmly, spend little control effort."""
    final = jax.tree.map(lambda a: a[..., -1, :], res.trajectory.states)
    reach = jnp.sum((final.pose.trans - target) ** 2, axis=-1)
    calm = 0.2 * jnp.sum(final.vel**2, axis=-1)
    effort = 2e-3 * jnp.sum(res.trajectory.controls**2, axis=(-2, -1))
    return jnp.mean(reach + calm + effort)


def tune(steps=40, batch=8, lr=0.15, verbose=True):
    import optax

    params, desired, target, init_b = build_problem(batch)
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-12, 1e-12, 40)
    )

    def loss_fn(log_q):
        cost = QuadraticTrackingCost(
            Q=jnp.diag(jnp.exp(log_q)),
            R=jnp.eye(4, dtype=log_q.dtype),
            desired_states=desired.states,
            desired_controls=desired.controls,
        )
        res = jax.vmap(
            lambda t: solve_implicit(params, cost, t, DT, options)
        )(init_b)
        return task_loss(res, target)

    value_and_grad = jax.jit(jax.value_and_grad(loss_fn))
    log_q = jnp.log(jnp.asarray([10.0] * 6 + [1.0] * 6, jnp.float64))
    opt = optax.adam(lr)
    opt_state = opt.init(log_q)
    history = []
    for step in range(steps):
        value, grad = value_and_grad(log_q)
        updates, opt_state = opt.update(grad, opt_state)
        log_q = optax.apply_updates(log_q, updates)
        history.append(float(value))
        if verbose and (step % 5 == 0 or step == steps - 1):
            print(f"step {step:3d}  task loss {float(value):.6f}")
    if verbose:
        print("tuned Q diag:", np.round(np.exp(np.asarray(log_q)), 3))
    return history, jnp.exp(log_q)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.15)
    args = ap.parse_args()
    history, _ = tune(steps=args.steps, batch=args.batch, lr=args.lr)
    improvement = history[0] / max(history[-1], 1e-12)
    print(f"task loss {history[0]:.4f} -> {history[-1]:.4f} "
          f"({improvement:.1f}x better)")


if __name__ == "__main__":
    main()
