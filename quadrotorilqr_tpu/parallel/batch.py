"""Scenario batching — the data-parallel axis the reference lacks entirely
(SURVEY.md §2.1: solve processes one trajectory via sequential loops,
ilqr.hh:89-95). Here thousands of independent iLQR problems run per chip via
vmap; per-scenario convergence masks replace control-flow divergence (JAX
batches the solver's while_loops into masked fixed-point iteration
automatically, so converged lanes freeze while stragglers continue).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..costs import QuadraticTrackingCost
from ..models.quadrotor import QuadrotorParams
from ..solver import ILQROptions, SolveResult, Trajectory
from ..solver import ilqr_module


def _batch_axes(tree, batched: bool):
    return jax.tree.map(lambda _: 0 if batched else None, tree)


@partial(
    jax.jit,
    static_argnames=(
        "dt_s", "options", "params_batched", "cost_batched", "associative",
        "model", "solver",
    ),
)
def solve_batch(
    params: QuadrotorParams,
    cost: QuadraticTrackingCost,
    initial_trajs: Trajectory,
    dt_s: float,
    options: ILQROptions = ILQROptions(),
    params_batched: bool = False,
    cost_batched: bool = False,
    associative: bool = False,
    model=None,
    solver: str = "ilqr",
    limits=None,
) -> SolveResult:
    """vmapped solve over a leading scenario axis.

    initial_trajs leaves are (B, N, ...). `params_batched` / `cost_batched`
    mark whether physical parameters / cost weights+targets also carry a
    leading B (per-scenario randomization, BASELINE.json configs 2-3);
    unbatched ones are closed over and broadcast by vmap.

    `associative=True` swaps every lane's backward pass for the O(log N)
    parallel-in-time Riccati (solver/parallel_riccati.py) — the small-batch
    x long-horizon regime where the horizon, not the scenario count, must
    fill the chip. `associative="auto"` applies the measured (B, N)
    dispatch rule (solver/ilqr.resolve_associative, from the
    benchmarks/assoc_regime.py grid).

    `solver` picks the per-lane algorithm: "ilqr" (exact reference
    semantics, default), "ddp" (full DDP curvature, solver/ddp.py), "fddp"
    / "fddp-ddp" (robust infeasible-start loop, solver/fddp.py — the
    recommended settings for aggressive scenario distributions; see
    benchmarks/solvers_bench.py for the measured trade-offs). These all
    run the vmapped XLA solvers; the KERNEL engines are
    solver/batched.solve_batch_latency (exact loop) and
    solver/batched.solve_batch_fddp (robust loop).

    `limits=(lo, hi)` adds control boxes: "ilqr" routes to the exact
    projected-Newton box solver (solver/constrained.solve_box), the fddp
    solvers run their clamped box-QP variant; "ddp" with limits is not
    supported (use "fddp-ddp").
    """
    # cost leaves may be individually batched (e.g. per-scenario Q/R with a
    # shared desired trajectory): infer the vmap axis per leaf
    # (costs/quadratic.cost_batched_flags — stage_weights have an (N,) core,
    # so a bare ndim==3 check misclassifies them).
    if cost_batched:
        from ..costs.quadratic import cost_batched_flags

        cost_axes = jax.tree.map(
            lambda batched: 0 if batched else None, cost_batched_flags(cost)
        )
    else:
        cost_axes = _batch_axes(cost, False)
    in_axes = (
        _batch_axes(params, params_batched),
        cost_axes,
        _batch_axes(initial_trajs, True),
    )
    if model is None:
        from ..models import quadrotor as model
    if associative == "auto":
        associative = ilqr_module.resolve_associative(
            initial_trajs.controls.shape[0], initial_trajs.controls.shape[1]
        )
        if solver != "ilqr" or limits is not None:
            associative = False  # auto never routes to an unsupported combo
    if solver == "ilqr" or solver == "ddp":
        if associative and solver == "ddp":
            raise ValueError("associative and ddp are mutually exclusive")
        if limits is not None:
            if solver == "ddp":
                raise ValueError(
                    "limits with ddp is unsupported; use solver='fddp-ddp'"
                )
            if associative:
                raise ValueError("limits and associative are incompatible")
            from ..solver.constrained import solve_box

            lo, hi = limits

            def one(p, c, t):
                return solve_box(p, c, t, dt_s, lo, hi, options, model=model)

        else:

            def one(p, c, t):
                return ilqr_module.solve(
                    p, c, t, dt_s, options, associative=associative,
                    model=model, ddp=(solver == "ddp"),
                )

    elif solver in ("fddp", "fddp-ddp"):
        if associative:
            raise ValueError("associative is not available for fddp solvers")
        from ..solver.fddp import solve_fddp

        def one(p, c, t):
            return solve_fddp(
                p, c, t, dt_s, options, model=model,
                ddp=(solver == "fddp-ddp"), limits=limits,
            )

    else:
        raise ValueError(f"unknown solver {solver!r}")
    return jax.vmap(one, in_axes=in_axes)(params, cost, initial_trajs)


def batch_stats(result: SolveResult):
    """Aggregate per-batch solver statistics (host-friendly summary)."""
    from ..solver.ilqr import STATUS_CONVERGED, STATUS_LINE_SEARCH_FAILED

    status = result.status
    return {
        "num_scenarios": status.shape[0] if status.ndim else 1,
        "frac_converged": jnp.mean((status == STATUS_CONVERGED).astype(jnp.float32)),
        "frac_ls_failed": jnp.mean(
            (status == STATUS_LINE_SEARCH_FAILED).astype(jnp.float32)
        ),
        "mean_iterations": jnp.mean(result.iterations.astype(jnp.float32)),
        "max_iterations": jnp.max(result.iterations),
        "mean_cost": jnp.mean(result.cost),
        "max_cost": jnp.max(result.cost),
    }


def initial_trajectory_from_state(x0, desired: Trajectory) -> Trajectory:
    """Build an initial trajectory for a scenario: the desired trajectory's
    controls/times with the scenario's initial state at stage 0. The solver's
    iteration-0 full rollout then makes it dynamically feasible (ilqr.hh:71-73).

    x0 leaves may carry a leading batch dim; desired is unbatched (shared).
    """
    batch = jax.tree.leaves(x0)[0].shape[:-1]

    def tile(leaf):
        return jnp.broadcast_to(leaf, batch + leaf.shape)

    states = jax.tree.map(tile, desired.states)
    states = jax.tree.map(
        lambda buf, x: buf.at[..., 0, :].set(x), states, x0
    )
    return Trajectory(
        times=jnp.broadcast_to(desired.times, batch + desired.times.shape),
        states=states,
        controls=jnp.broadcast_to(desired.controls, batch + desired.controls.shape),
    )
