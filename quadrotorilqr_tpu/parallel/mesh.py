"""Multi-chip / multi-host distribution — the TPU-native replacement for a
distributed-communication backend (SURVEY.md §5.8: the reference has none;
our scale axis is the scenario batch sharded over a device mesh, with XLA
collectives over ICI/DCN for cross-chip statistics).

Two paths are provided:

  * `solve_sharded` — GSPMD: jit the vmapped solve with NamedSharding
    constraints on the scenario axis; XLA partitions automatically. Zero
    collectives needed for the solves themselves (embarrassingly parallel);
    this is the throughput path.
  * `solve_sharded_with_stats` — shard_map: explicit per-shard solve + `psum`
    reduction of convergence statistics over the mesh (the Monte-Carlo
    aggregation of BASELINE.json config 5), demonstrating the ICI collective
    path end-to-end.

Multi-host: call `jax.distributed.initialize()` before building the mesh;
everything below is host-count agnostic (mesh covers all global devices).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..costs import QuadraticTrackingCost
from ..models.quadrotor import QuadrotorParams
from ..solver import ILQROptions, SolveResult, Trajectory
from ..solver import ilqr_module
from ..solver.ilqr import STATUS_CONVERGED

SCENARIO_AXIS = "scenario"


def make_scenario_mesh(devices=None, axis_name=SCENARIO_AXIS) -> Mesh:
    """1-D mesh over all (global) devices; scenarios shard along it."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_scenarios(tree, mesh: Mesh, axis_name=SCENARIO_AXIS):
    """Place a batched pytree so its leading axis is sharded over the mesh.

    Leaves already carrying the target sharding (e.g. global arrays built by
    parallel/distributed.distribute_batch — a multi-process device_put from
    one host would fail) pass through untouched."""
    sharding = NamedSharding(mesh, P(axis_name))

    def place(leaf):
        if isinstance(leaf, jax.Array) and leaf.sharding == sharding:
            return leaf
        return jax.device_put(leaf, sharding)

    return jax.tree.map(place, tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda leaf: jax.device_put(leaf, sharding), tree)


def solve_sharded(
    params: QuadrotorParams,
    cost: QuadraticTrackingCost,
    initial_trajs: Trajectory,
    dt_s: float,
    options: ILQROptions,
    mesh: Mesh,
    axis_name: str = SCENARIO_AXIS,
) -> SolveResult:
    """GSPMD path: batched solve with the scenario axis sharded over the mesh.

    `initial_trajs` leaves are (B, N, ...) with B divisible by the mesh size;
    params/cost are replicated (shared across scenarios).
    """
    batch_sharding = NamedSharding(mesh, P(axis_name))

    @partial(jax.jit, static_argnames=())
    def run(p, c, t):
        t = jax.tree.map(lambda leaf: jax.lax.with_sharding_constraint(leaf, batch_sharding), t)
        return jax.vmap(lambda tt: ilqr_module.solve(p, c, tt, dt_s, options))(t)

    return run(params, cost, shard_scenarios(initial_trajs, mesh, axis_name))


def solve_sharded_with_stats(
    params: QuadrotorParams,
    cost: QuadraticTrackingCost,
    initial_trajs: Trajectory,
    dt_s: float,
    options: ILQROptions,
    mesh: Mesh,
    axis_name: str = SCENARIO_AXIS,
):
    """shard_map path: per-shard vmapped solve, then psum'd global statistics
    over ICI (BASELINE.json config 5: collective convergence reduction).

    Returns (SolveResult with sharded leaves, stats dict of replicated
    scalars: global converged count, mean iterations, mean/total cost).
    """
    from jax import shard_map

    n_total = jax.tree.leaves(initial_trajs)[0].shape[0]

    def per_shard(t):
        result = jax.vmap(lambda tt: ilqr_module.solve(params, cost, tt, dt_s, options))(t)
        local_converged = jnp.sum((result.status == STATUS_CONVERGED).astype(jnp.float32))
        local_iters = jnp.sum(result.iterations.astype(jnp.float32))
        local_cost = jnp.sum(result.cost)
        # ICI collectives: global Monte-Carlo reduction
        n_converged = jax.lax.psum(local_converged, axis_name)
        total_iters = jax.lax.psum(local_iters, axis_name)
        total_cost = jax.lax.psum(local_cost, axis_name)
        stats = {
            "n_converged": n_converged,
            "mean_iterations": total_iters / n_total,
            "mean_cost": total_cost / n_total,
            "total_cost": total_cost,
        }
        return result, stats

    batch_spec = jax.tree.map(lambda _: P(axis_name), initial_trajs)

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(batch_spec,),
        out_specs=(
            _result_specs(axis_name),
            {
                "n_converged": P(),
                "mean_iterations": P(),
                "mean_cost": P(),
                "total_cost": P(),
            },
        ),
        check_vma=False,
    )
    run = jax.jit(sharded)
    return run(shard_scenarios(initial_trajs, mesh, axis_name))


def solve_sharded_fused(
    params: QuadrotorParams,
    cost: QuadraticTrackingCost,
    initial_trajs: Trajectory,
    dt_s: float,
    options: ILQROptions,
    mesh: Mesh,
    axis_name: str = SCENARIO_AXIS,
    interpret: bool = False,
    engine: str = "whole",
):
    """Fused-kernel multi-chip path: shard_map of the Pallas solver over the
    scenario mesh, with psum'd global convergence statistics (BASELINE.json
    config 5 at kernel speed).

    `engine="whole"` (default) runs each shard through the whole-solve
    single-kernel engine (kernels/solve.py — fastest measured at every
    batch size); `engine="loop"` uses the batch-level kernel loop (needed
    for options.populate_debug). The per-shard batch (B / mesh size) must
    be a multiple of the 128-lane kernel tile. `interpret=True` runs the
    kernels in interpreter mode (CPU-mesh tests without TPU hardware).
    """
    from jax import shard_map

    from ..solver.batched import solve_batch_fused, solve_batch_latency

    solver = solve_batch_latency if engine == "whole" else solve_batch_fused
    n_total = jax.tree.leaves(initial_trajs)[0].shape[0]

    def per_shard(t):
        result = solver(
            params, cost, t, dt_s, options, interpret=interpret
        )
        local_converged = jnp.sum((result.status == STATUS_CONVERGED).astype(jnp.float32))
        local_iters = jnp.sum(result.iterations.astype(jnp.float32))
        local_cost = jnp.sum(result.cost)
        stats = {
            "n_converged": jax.lax.psum(local_converged, axis_name),
            "mean_iterations": jax.lax.psum(local_iters, axis_name) / n_total,
            "mean_cost": jax.lax.psum(local_cost, axis_name) / n_total,
            "total_cost": jax.lax.psum(local_cost, axis_name),
        }
        return result, stats

    batch_spec = jax.tree.map(lambda _: P(axis_name), initial_trajs)
    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(batch_spec,),
        out_specs=(
            _result_specs(axis_name),
            {
                "n_converged": P(),
                "mean_iterations": P(),
                "mean_cost": P(),
                "total_cost": P(),
            },
        ),
        check_vma=False,
    )
    run = jax.jit(sharded)
    return run(shard_scenarios(initial_trajs, mesh, axis_name))


def _result_specs(axis_name):
    """PartitionSpec pytree matching SolveResult (debug=None)."""
    from ..lie.se3 import SE3
    from ..models.quadrotor import State
    from ..solver.ilqr import SolveResult, Trajectory

    spec = P(axis_name)
    return SolveResult(
        trajectory=Trajectory(
            times=spec,
            states=State(pose=SE3(quat=spec, trans=spec), vel=spec),
            controls=spec,
        ),
        cost=spec,
        iterations=spec,
        status=spec,
        debug=None,
    )
