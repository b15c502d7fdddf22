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


def _cost_batched_flags(cost):
    """See costs/quadratic.cost_batched_flags (one shared definition)."""
    from ..costs.quadratic import cost_batched_flags

    return cost_batched_flags(cost)


def _batched_operands(params, cost):
    """(params_batched, cost_axes): per-scenario detection shared by every
    sharded helper. Params are per-scenario iff every leaf carries a leading
    batch dim (kernels/backward._prep_params contract — mass_kg.ndim >= 1
    is the discriminator); cost leaves are per-scenario iff they carry a
    dim beyond their unbatched core (see _cost_batched_flags)."""
    params_batched = jnp.ndim(params.mass_kg) >= 1
    cost_axes = jax.tree.map(
        lambda batched: 0 if batched else None, _cost_batched_flags(cost)
    )
    return params_batched, cost_axes


def _place_cost(cost, mesh: Mesh, axis_name):
    """Shard per-scenario cost leaves over the mesh, leave shared leaves
    uncommitted (jit replicates them; a multi-process device_put of a
    replicated leaf from one host would fail)."""
    sharding = NamedSharding(mesh, P(axis_name))

    def place(leaf, batched):
        if not batched:
            return leaf
        if isinstance(leaf, jax.Array) and leaf.sharding == sharding:
            return leaf
        return jax.device_put(leaf, sharding)

    return jax.tree.map(place, cost, _cost_batched_flags(cost))


def solve_sharded(
    params: QuadrotorParams,
    cost: QuadraticTrackingCost,
    initial_trajs: Trajectory,
    dt_s: float,
    options: ILQROptions,
    mesh: Mesh,
    axis_name: str = SCENARIO_AXIS,
    model=None,
) -> SolveResult:
    """GSPMD path: batched solve with the scenario axis sharded over the mesh.

    `initial_trajs` leaves are (B, N, ...) with B divisible by the mesh size.
    Params/cost may be shared (replicated over the mesh) or per-scenario —
    per-scenario leaves (every params leaf with a leading B; cost leaves of
    ndim 3) are sharded along the scenario axis with the trajectories.
    """
    batch_sharding = NamedSharding(mesh, P(axis_name))
    params_batched, cost_axes = _batched_operands(params, cost)

    def wsc(leaf):
        return jax.lax.with_sharding_constraint(leaf, batch_sharding)

    @partial(jax.jit, static_argnames=())
    def run(p, c, t):
        t = jax.tree.map(wsc, t)
        if params_batched:
            p = jax.tree.map(wsc, p)
        c = jax.tree.map(
            lambda leaf, batched: wsc(leaf) if batched else leaf,
            c,
            _cost_batched_flags(c),
        )
        return jax.vmap(
            lambda pp, cc, tt: ilqr_module.solve(
                pp, cc, tt, dt_s, options, model=model
            ),
            in_axes=(0 if params_batched else None, cost_axes, 0),
        )(p, c, t)

    if params_batched:
        params = shard_scenarios(params, mesh, axis_name)
    return run(
        params,
        _place_cost(cost, mesh, axis_name),
        shard_scenarios(initial_trajs, mesh, axis_name),
    )


def solve_sharded_with_stats(
    params: QuadrotorParams,
    cost: QuadraticTrackingCost,
    initial_trajs: Trajectory,
    dt_s: float,
    options: ILQROptions,
    mesh: Mesh,
    axis_name: str = SCENARIO_AXIS,
    model=None,
):
    """shard_map path: per-shard vmapped solve, then psum'd global statistics
    over ICI (BASELINE.json config 5: collective convergence reduction).

    Params/cost may be shared or per-scenario (see `solve_sharded`). Returns
    (SolveResult with sharded leaves, stats dict of replicated scalars:
    global converged count, mean iterations, mean/total cost).
    """
    params_batched, cost_axes = _batched_operands(params, cost)

    def per_shard_solve(p, c, t):
        return jax.vmap(
            lambda pp, cc, tt: ilqr_module.solve(
                pp, cc, tt, dt_s, options, model=model
            ),
            in_axes=(0 if params_batched else None, cost_axes, 0),
        )(p, c, t)

    return _shard_map_solve(
        per_shard_solve, params, cost, initial_trajs, mesh, axis_name
    )


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
    model=None,
    supertile: bool = False,
):
    """Fused-kernel multi-chip path: shard_map of the Pallas solver over the
    scenario mesh, with psum'd global convergence statistics (BASELINE.json
    config 5 at kernel speed).

    `engine="whole"` (default) runs each shard through the whole-solve
    single-kernel engine (kernels/solve.py — fastest measured at every
    batch size); `engine="loop"` uses the batch-level kernel loop (needed
    for options.populate_debug). Params/cost may be shared or per-scenario
    (see `solve_sharded`; the kernels take per-scenario operands as lane
    tiles). The per-shard batch (B / mesh size) must be a multiple of the
    128-lane kernel tile. `interpret=True` runs the kernels in interpreter
    mode (CPU-mesh tests without TPU hardware).

    `supertile=True` (engine="whole") runs each shard's kernel in the
    dense-register (r, c, 8, 128) layout — the single-chip headline layout
    composed with the mesh (VERDICT r4 #2). The per-DEVICE batch pads to
    1024-lane supertiles inside the shard, so fleet-scale configs (>= 1024
    scenarios per chip) pay zero padding; the VMEM guard demotes per shard
    exactly as on one chip.
    """
    from ..solver.batched import solve_batch_fused, solve_batch_latency

    solver = solve_batch_latency if engine == "whole" else solve_batch_fused
    kw = {"supertile": True} if (supertile and engine == "whole") else {}

    def per_shard_solve(p, c, t):
        return solver(
            p, c, t, dt_s, options, interpret=interpret, model=model, **kw
        )

    return _shard_map_solve(
        per_shard_solve, params, cost, initial_trajs, mesh, axis_name
    )


def solve_sharded_fddp(
    params,
    cost,
    initial_trajs: Trajectory,
    dt_s: float,
    options: ILQROptions,
    mesh: Mesh,
    axis_name: str = SCENARIO_AXIS,
    fddp_options=None,
    interpret: bool = False,
    ddp: bool = False,
    limits=None,
    model=None,
    refine=None,
    supertile: bool = False,
):
    """Robust-solver multi-chip path: shard_map of the FDDP kernels
    (solver/batched.solve_batch_fddp — whole-solve or streamed per shard,
    exact-DDP curvature with ddp=True) over the scenario mesh, with psum'd
    global statistics. The multi-host Monte-Carlo story for the HARD
    scenario classes (BASELINE.json config 5's robust-mode counterpart).

    `refine` (int or tuple of cumulative trip boundaries, the
    solve_batch_fddp_refine semantics) turns on CROSS-DEVICE straggler
    rebalance: at each boundary the global pending mask is gathered, the
    pending lanes are permuted to the FRONT of the global batch (a GSPMD
    gather — the collective rides ICI), and the next phase resumes exactly
    via the kernels' mu/status/iters rows. A device whose lanes all
    converged stops grinding full trips for a straggler neighbor: the
    straggler population lands on the fewest devices/tiles and every
    all-frozen tile degrades to a per-trip skip. `ddp` may then be a
    per-phase tuple (the HYBRID curvature schedule: Gauss-Newton early
    phases, exact curvature on the compacted stragglers).

    `supertile=True` runs each shard's VMEM FDDP kernel (and every refine
    phase) in the dense-register (r, c, 8, 128) layout — see
    solve_batch_fddp; per-shard padding + VMEM-guarded demotion apply per
    device."""
    from ..solver.batched import solve_batch_fddp

    if refine is not None:
        return _sharded_fddp_refine(
            params, cost, initial_trajs, dt_s, options, mesh, axis_name,
            fddp_options, interpret, ddp, limits, model, refine, supertile,
        )
    if isinstance(ddp, tuple):
        raise ValueError("per-phase ddp tuples require refine=...")

    def per_shard_solve(p, c, t):
        return solve_batch_fddp(
            p, c, t, dt_s, options, fddp_options=fddp_options,
            interpret=interpret, model=model, ddp=ddp, limits=limits,
            supertile=supertile,
        )

    return _shard_map_solve(
        per_shard_solve, params, cost, initial_trajs, mesh, axis_name
    )


def _sharded_fddp_refine(
    params, cost, initial_trajs, dt_s, options, mesh, axis_name,
    fddp_options, interpret, ddp, limits, model, refine, supertile=False,
):
    """Multi-phase compacted robust solve ACROSS the mesh (VERDICT r3 #3).

    One jitted global program (zero host round trips between phases):

      1. each phase shard_maps the FDDP engine (kernels/fddp.py VMEM or
         kernels/stream_fddp.py streamed) over the scenario mesh, resuming
         from the per-lane mu/status/iters rows (zeros == fresh start, the
         engines' own encoding);
      2. at each boundary the GLOBAL pending mask orders a stable argsort
         permutation; gathering every lane operand through it is a plain
         `a[perm]` on the sharded global arrays — GSPMD lowers it to the
         cross-device collective — with sharding constraints pinning the
         result back to the scenario axis;
      3. the final results scatter back through the inverse permutation.

    Lane-for-lane identical to the single-device
    solver/batched.solve_batch_fddp_refine (cross-program FMA-fusion noise
    aside — statuses/iterations match exactly, tests/test_parallel_refine).
    Requests the kernels cannot serve are REFUSED loudly (resume rows are
    a kernel feature; there is no XLA fallback to silently lose the
    rebalance to)."""
    from dataclasses import replace

    from jax import shard_map

    from ..kernels.fddp import max_horizon_for_fddp, solve_fddp_fused
    from ..kernels.models import lane_model_for
    from ..kernels.stream_fddp import solve_fddp_streamed
    from ..lie.se3 import SE3
    from ..models.quadrotor import State
    from ..solver.fddp import FDDPOptions
    from ..solver.ilqr import STATUS_MAX_ITERS

    if fddp_options is None:
        fddp_options = FDDPOptions()
    try:
        lane_model = lane_model_for(params, model)
    except TypeError as e:
        raise ValueError(
            "solve_sharded_fddp(refine=...) needs a kernel-servable model "
            "(the resume rows are a kernel feature)"
        ) from e
    if options.line_search_params.max_iters < 1:
        raise ValueError(
            "solve_sharded_fddp(refine=...) needs line-search probes >= 1 "
            "(zero-probe solves route to XLA, which cannot resume)"
        )
    if limits is not None and any(jnp.ndim(b) != 0 for b in limits):
        raise ValueError(
            "per-scenario limits are unsupported on the sharded refine "
            "path (use scalar bounds, or the single-device "
            "solve_batch_fddp_refine)"
        )

    cc = options.convergence_criteria
    total = int(cc.max_iters)
    bounds = (refine,) if isinstance(refine, int) else tuple(refine)
    budgets, used = [], 0
    for b in bounds:
        b = min(int(b), total)
        if b > used:
            budgets.append(b - used)
            used = b
    budgets.append(total - used)
    ddp_seq = (
        tuple(bool(d) for d in ddp)
        if isinstance(ddp, tuple)
        else (bool(ddp),) * len(budgets)
    )
    if len(ddp_seq) != len(budgets):
        raise ValueError(
            f"per-phase ddp needs one flag per phase: {len(budgets)} "
            f"phases from refine={refine!r}, got {len(ddp_seq)} flags"
        )
    # ddp + substeps composes since round 5 (the chained exact curvature,
    # kernels/backward._riccati_stage) — no refusal left in the matrix

    batch = initial_trajs.controls.shape[0]
    horizon = initial_trajs.controls.shape[1]
    n_dev = mesh.devices.size
    if batch % (n_dev * 128) != 0:
        raise ValueError(
            f"global batch {batch} must give every one of the {n_dev} "
            "devices a multiple of the 128-lane kernel tile"
        )
    engine = (
        solve_fddp_streamed
        if horizon > max_horizon_for_fddp(lane_model.u_dim)
        else solve_fddp_fused
    )
    # supertile per shard: the refine phases call the kernel entry point
    # directly (no solve_batch_fddp padding layer), so demote unless each
    # device's shard is whole 1024-lane supertiles and the horizon fits
    # the 8x-VMEM budget (solver/batched._supertile_horizon_budget)
    if supertile:
        from ..solver.batched import _supertile_horizon_budget

        if batch % (n_dev * 1024) != 0 or (
            engine is solve_fddp_fused
            and horizon > _supertile_horizon_budget(
                cost, params, lane_model.u_dim, rows_base=60
            )
        ):
            supertile = False
    engine_kw = {"supertile": True} if supertile else {}
    dtype = initial_trajs.controls.dtype
    spec = P(axis_name)
    sharding = NamedSharding(mesh, spec)
    cost_flags = _cost_batched_flags(cost)
    params_batched = jnp.ndim(params.mass_kg) >= 1

    batch_spec = jax.tree.map(lambda _: spec, initial_trajs)
    params_spec = jax.tree.map(
        lambda _: spec if params_batched else P(), params
    )
    cost_spec = jax.tree.map(
        lambda leaf, b: spec if b else P(), cost, cost_flags
    )
    cost_in = jax.tree.map(
        lambda leaf, b: leaf if b
        else jnp.zeros((), jnp.asarray(leaf).dtype),
        cost, cost_flags,
    )
    params_in = params if params_batched else jax.tree.map(
        lambda leaf: jnp.zeros((), jnp.asarray(leaf).dtype), params
    )
    traj_spec = Trajectory(
        times=spec,
        states=State(pose=SE3(quat=spec, trans=spec), vel=spec),
        controls=spec,
    )

    def make_phase(budget, phase_ddp):
        opts_k = replace(
            options, convergence_criteria=replace(cc, max_iters=budget)
        )

        def per_shard(p, c, t, mu, status, iters):
            c = jax.tree.map(
                lambda shared, local, b: local if b else shared,
                cost, c, cost_flags,
            )
            return engine(
                p if params_batched else params, c, t, dt_s, opts_k,
                fddp_options=fddp_options, interpret=interpret, model=model,
                ddp=phase_ddp, limits=limits,
                initial_mu=mu, initial_status=status, initial_iters=iters,
                return_mu=True, **engine_kw,
            )

        return shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(params_spec, cost_spec, batch_spec, spec, spec, spec),
            out_specs=(traj_spec, spec, spec, spec, spec),
            check_vma=False,
        )

    phases = [
        make_phase(budget, ddp_seq[k]) for k, budget in enumerate(budgets)
    ]

    def pin(a):
        return jax.lax.with_sharding_constraint(a, sharding)

    def run(params_g, cost_g, traj):
        cur2orig = pin(jnp.arange(batch))
        # zeros ARE the engines' fresh-start encoding (lane_row(None))
        mu = pin(jnp.zeros((batch,), dtype))
        status = pin(jnp.zeros((batch,), jnp.int32))
        iters = pin(jnp.zeros((batch,), jnp.int32))
        for k, phase in enumerate(phases):
            traj, cost_v, iters, status, mu = phase(
                params_g, cost_g, traj, mu, status, iters
            )
            if k == len(phases) - 1:
                break
            pending = status == STATUS_MAX_ITERS
            # stable: pending lanes first, relative order preserved both
            # ways, so the scatter-back is bit-reproducible
            perm = jnp.argsort(jnp.logical_not(pending), stable=True)
            gather = lambda a: pin(a[perm])
            cur2orig = gather(cur2orig)
            traj = jax.tree.map(gather, traj)
            mu, status, iters = gather(mu), gather(status), gather(iters)
            if params_batched:
                params_g = jax.tree.map(gather, params_g)
            cost_g = jax.tree.map(
                lambda a, b: gather(a) if b else a, cost_g, cost_flags
            )
        inv = jnp.argsort(cur2orig, stable=True)
        scatter = lambda a: pin(a[inv])
        result = SolveResult(
            trajectory=jax.tree.map(scatter, traj),
            cost=scatter(cost_v),
            iterations=scatter(iters),
            status=scatter(status),
            debug=None,
        )
        # global stats on the already-global arrays (the psum the
        # non-refine path does per shard happens implicitly in these
        # cross-shard reductions)
        conv = (result.status == STATUS_CONVERGED).astype(jnp.float32)
        stats = {
            "n_converged": jnp.sum(conv),
            "mean_iterations": jnp.mean(
                result.iterations.astype(jnp.float32)
            ),
            "mean_cost": jnp.mean(result.cost),
            "total_cost": jnp.sum(result.cost),
        }
        return result, stats

    run = jax.jit(run)
    if params_batched:
        params_in = shard_scenarios(params_in, mesh, axis_name)
    return run(
        params_in,
        _place_cost(cost_in, mesh, axis_name),
        shard_scenarios(initial_trajs, mesh, axis_name),
    )


def _shard_map_solve(
    per_shard_solve, params, cost, initial_trajs, mesh: Mesh, axis_name: str
):
    """Common shard_map plumbing for the with-stats solvers: shard the
    scenario axis (including any per-scenario params/cost leaves), run
    `per_shard_solve(params, cost, trajs)` on each shard, psum global
    convergence statistics over the mesh.

    Shared params/cost are closed over (compile-time constants, replicated
    everywhere — including multi-process, where a device_put from one host
    couldn't span non-addressable devices); per-scenario leaves become
    explicit sharded shard_map operands."""
    from jax import shard_map

    params_batched, _ = _batched_operands(params, cost)
    cost_flags = _cost_batched_flags(cost)
    n_total = jax.tree.leaves(initial_trajs)[0].shape[0]

    def per_shard(p, c, t):
        # per-scenario cost leaves arrive sharded; shared ones rode along as
        # scalar dummies — restore them from the closure
        c = jax.tree.map(
            lambda shared, local, batched: local if batched else shared,
            cost, c, cost_flags,
        )
        result = per_shard_solve(p if params_batched else params, c, t)
        local_converged = jnp.sum(
            (result.status == STATUS_CONVERGED).astype(jnp.float32)
        )
        local_iters = jnp.sum(result.iterations.astype(jnp.float32))
        local_cost = jnp.sum(result.cost)
        # ICI collectives: global Monte-Carlo reduction
        stats = {
            "n_converged": jax.lax.psum(local_converged, axis_name),
            "mean_iterations": jax.lax.psum(local_iters, axis_name) / n_total,
            "mean_cost": jax.lax.psum(local_cost, axis_name) / n_total,
            "total_cost": jax.lax.psum(local_cost, axis_name),
        }
        return result, stats

    batch_spec = jax.tree.map(lambda _: P(axis_name), initial_trajs)
    params_spec = jax.tree.map(
        lambda _: P(axis_name) if params_batched else P(), params
    )
    # shard_map operand trees must be arrays with static specs, so shared
    # leaves (replicated via closure) ride as zero-size scalar dummies
    cost_in = jax.tree.map(
        lambda leaf, batched: leaf if batched
        else jnp.zeros((), jnp.asarray(leaf).dtype),
        cost, cost_flags,
    )
    cost_spec = jax.tree.map(
        lambda leaf, batched: P(axis_name) if batched else P(),
        cost, cost_flags,
    )
    params_in = params if params_batched else jax.tree.map(
        lambda leaf: jnp.zeros((), jnp.asarray(leaf).dtype), params
    )

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(params_spec, cost_spec, batch_spec),
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
    if params_batched:
        params_in = shard_scenarios(params_in, mesh, axis_name)
    return run(
        params_in,
        _place_cost(cost_in, mesh, axis_name),
        shard_scenarios(initial_trajs, mesh, axis_name),
    )


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
