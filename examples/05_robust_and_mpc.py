"""Hard problems and closed-loop control: FDDP rescue + terminal-weighted MPC.

Part 1 — a scenario the exact reference loop cannot solve (aggressive
tumble + coarse dt: the iteration-0 feasibility rollout diverges and the
reference would throw). `solve_fddp(ddp=True)` — multiple-shooting gaps +
full-DDP curvature + adaptive regularization — converges to a dynamically
feasible optimum.

Part 2 — warm-started receding-horizon MPC for a fleet, with terminal-cost
emphasis via per-stage weights, the whole loop one compiled scan.

Run: python examples/05_robust_and_mpc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)


def main(mpc_steps=10):
    import jax.numpy as jnp
    import numpy as np

    from quadrotorilqr_tpu.app.mpc import run_mpc
    from quadrotorilqr_tpu.app import workloads
    from quadrotorilqr_tpu.costs import QuadraticTrackingCost
    from quadrotorilqr_tpu.lie import se3
    from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams, State
    from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
    from quadrotorilqr_tpu.solver import (
        STATUS_CONVERGED,
        Trajectory,
        solve,
        solve_fddp,
    )
    from quadrotorilqr_tpu.solver.options import (
        ConvergenceCriteria,
        ILQROptions,
        LineSearchParams,
    )

    f64 = jnp.float64

    # ---- part 1: rescue a divergent scenario -----------------------------
    n, dt = 30, 0.15
    params = QuadrotorParams.create(
        1.0, jnp.asarray(np.diag([0.01, 0.012, 0.02]), f64), 0.17, 0.016, 9.81
    )
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x0 = State(
        pose=se3.exp(2.0 * jax.random.normal(k1, (6,), f64)),
        vel=2.0 * jax.random.normal(k2, (6,), f64),
    )
    desired = Trajectory(
        times=dt * jnp.arange(n, dtype=f64),
        states=State(pose=se3.identity((n,), f64), vel=jnp.zeros((n, 6), f64)),
        controls=jnp.full((n, 4), 9.81 / 4.0, f64),
    )
    cost = QuadraticTrackingCost(
        Q=jnp.diag(jnp.asarray([100.0] * 6 + [1.0] * 6, f64)),
        R=1e-3 * jnp.eye(4, dtype=f64),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    init = jax.tree.map(
        lambda a: a[0],
        initial_trajectory_from_state(jax.tree.map(lambda a: a[None], x0), desired),
    )
    opts = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 40),
        convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 100),
    )
    plain = solve(params, cost, init, dt, opts)
    robust = solve_fddp(params, cost, init, dt, opts, ddp=True)
    print("— aggressive tumble scenario —")
    print(f"reference loop: status {int(plain.status)} "
          f"(2=line-search failed), cost {float(plain.cost)}")
    print(f"fddp(ddp=True): status {int(robust.status)} "
          f"(1=converged), cost {float(robust.cost):.2f}")
    assert int(robust.status) == STATUS_CONVERGED

    # ---- part 1b: the robust mode at KERNEL speed -------------------------
    # the whole multiple-shooting loop in one Pallas program per 128-lane
    # tile (kernels/fddp.py), lane-for-lane equal to vmap(solve_fddp)
    from quadrotorilqr_tpu.solver.batched import solve_batch_fddp

    kb = 128
    kk1, kk2 = jax.random.split(jax.random.PRNGKey(3))
    fleet0 = State(
        pose=se3.exp(1.0 * jax.random.normal(kk1, (kb, 6), f64)),
        vel=1.0 * jax.random.normal(kk2, (kb, 6), f64),
    )
    # a shorter horizon keeps the CPU interpret-mode demo quick; on TPU the
    # compiled kernel solves the full batch in milliseconds
    desired16 = jax.tree.map(lambda a: a[:16], desired)
    cost16 = QuadraticTrackingCost(
        Q=cost.Q, R=cost.R,
        desired_states=desired16.states,
        desired_controls=desired16.controls,
    )
    batch_init = initial_trajectory_from_state(fleet0, desired16)
    batch_opts = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 40),
        convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 60),
    )
    # refine="auto" (round 5): the measured-best robust configuration —
    # multi-phase straggler compaction + the hybrid curvature flip
    # (Gauss-Newton early, exact-DDP on the compacted stragglers) — with
    # no tuning arguments; measured 39.5k solves/s @ 98.8% on the
    # aggressive class on one v5e chip (BENCH_LOCAL.md round 5)
    fleet = solve_batch_fddp(
        params, cost16, batch_init, dt, batch_opts,
        interpret=jax.devices()[0].platform != "tpu",
        refine="auto",
    )
    conv = float((fleet.status == STATUS_CONVERGED).mean())
    print("— robust mode at kernel speed (solve_batch_fddp refine='auto') —")
    print(f"batch of {kb} aggressive scenarios: {conv:.0%} converged, "
          f"mean {float(fleet.iterations.mean()):.1f} iterations")
    assert conv > 0.9

    # ---- part 2: fleet MPC with terminal emphasis ------------------------
    b, horizon, dtm = 128, 20, 0.05
    n_total = mpc_steps + horizon + 1
    hover = jnp.full((n_total, 4), 9.81 / 4.0, f64)
    des_full = Trajectory(
        times=dtm * jnp.arange(n_total, dtype=f64),
        states=State(
            pose=se3.identity((n_total,), f64), vel=jnp.zeros((n_total, 6), f64)
        ),
        controls=hover,
    )
    q, r = workloads.demo_weights(f64)
    tau = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (b, 6), f64)
    tau = tau.at[:, 3:6].set(0.0)
    fleet_x0 = State(pose=se3.exp(tau), vel=jnp.zeros((b, 6), f64))
    w = jnp.ones((horizon,), f64).at[-1].set(10.0)  # terminal emphasis
    out = run_mpc(
        params=workloads.demo_params(f64),
        q_weight=q, r_weight=r, desired_full=des_full, x0=fleet_x0,
        n_steps=mpc_steps, horizon=horizon, dt_s=dtm,
        options=ILQROptions(convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 3)),
        interpret=jax.devices()[0].platform != "tpu",
        stage_weights=w,
    )
    err0 = float(np.linalg.norm(np.asarray(out["x_trans"])[:, 0], axis=-1).mean())
    errN = float(
        np.linalg.norm(np.asarray(out["x_final"].pose.trans), axis=-1).mean()
    )
    print("— fleet MPC (terminal-weighted) —")
    print(f"fleet of {b}: mean position error {err0:.3f} -> {errN:.3f} m "
          f"over {mpc_steps} steps")
    return robust, out


if __name__ == "__main__":
    main()
