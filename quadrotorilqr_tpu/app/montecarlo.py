"""Monte-Carlo trajectory-library generation — the production pattern of
BASELINE.json config 5 as a user-facing tool, tying the subsystems together:

  * scenario sampling: randomized initial SE(3) poses and (optionally)
    randomized physical params (mass/inertia/arm/kappa — domain
    randomization through the per-scenario param path of the kernels);
  * the whole-solve kernel engine over the full batch, sharded across every
    available chip (shard_map + psum'd convergence statistics when a mesh
    is used, single-chip otherwise; multi-HOST via parallel/distributed.py);
  * convergence accounting per STATUS code (SURVEY.md §5.3 failure
    detection: batched solves report, they don't throw);
  * orbax checkpointing of the full SolveResult (io/checkpoint.py), resume-
    able onto any mesh topology, plus reference-wire-compatible proto
    export of individual library entries (io/proto.py).

CLI:  python -m quadrotorilqr_tpu.app.montecarlo \
          --batch 4096 --horizon 50 --iters 8 --out /tmp/qilqr_library
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..costs.quadratic import QuadraticTrackingCost
from ..models.quadrotor import QuadrotorParams
from ..parallel.batch import initial_trajectory_from_state
from ..solver.batched import solve_batch_latency
from ..solver.ilqr import (
    STATUS_CONVERGED,
    STATUS_LINE_SEARCH_FAILED,
    STATUS_MAX_ITERS,
    SolveResult,
)
from ..solver.options import ConvergenceCriteria, ILQROptions, LineSearchParams
from . import workloads


def sample_params(key, batch, dtype=jnp.float32) -> QuadrotorParams:
    """Domain-randomized physical params: every leaf carries the batch dim
    (the per-scenario param contract of kernels/backward._prep_params)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mass = jax.random.uniform(k1, (batch,), dtype, 0.7, 1.5)
    diag = jax.random.uniform(k2, (batch, 3), dtype, 0.4, 1.2)
    inertia = jax.vmap(jnp.diag)(diag)
    arm = jax.random.uniform(k3, (batch,), dtype, 0.15, 0.3)
    kappa = jax.random.uniform(k4, (batch,), dtype, 0.01, 0.02)
    return QuadrotorParams(
        mass_kg=mass,
        inertia=inertia,
        arm_length_m=arm,
        torque_to_thrust_ratio_m=kappa,
        g_mpss=jnp.full((batch,), 9.81, dtype),
    )


def generate_library(
    batch: int = 4096,
    horizon: int = 50,
    iters: int = 8,
    dt_s: float = 0.02,
    pose_scale: float = 0.5,
    randomize_params: bool = False,
    seed: int = 0,
    use_mesh: bool = False,
    dtype=jnp.float32,
):
    """Solve `batch` randomized scenarios; returns (SolveResult, stats dict).

    `use_mesh=True` shards the batch over all (global) devices with psum'd
    statistics — the multi-chip/multi-host path. Randomized per-scenario
    params shard along the scenario axis with the trajectories.
    """
    key = jax.random.PRNGKey(seed)
    k_pose, k_params = jax.random.split(key)
    init_states, desired = workloads.hover_to_waypoint(
        k_pose, batch, n=horizon, dt_s=dt_s, dtype=dtype, pose_scale=pose_scale
    )
    q, r = workloads.demo_weights(dtype)
    cost = QuadraticTrackingCost(
        Q=q, R=r, desired_states=desired.states, desired_controls=desired.controls
    )
    trajs = initial_trajectory_from_state(init_states, desired)
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-6, 1e-6, iters),
    )
    if randomize_params:
        params = sample_params(k_params, batch, dtype)
    else:
        params = QuadrotorParams.create(
            1.0, jnp.eye(3, dtype=dtype), 0.2, 0.016, 9.81
        )

    if use_mesh:
        from ..parallel.mesh import make_scenario_mesh, solve_sharded_fused

        mesh = make_scenario_mesh()
        result, mesh_stats = solve_sharded_fused(
            params, cost, trajs, dt_s, options, mesh,
            interpret=jax.devices()[0].platform != "tpu",
        )
        stats = {k: float(np.asarray(v)) for k, v in mesh_stats.items()}
    else:
        result = solve_batch_latency(
            params, cost, trajs, dt_s, options,
            # kernels need real TPU hardware; CPU (tests, dev boxes) runs
            # the same programs in interpreter mode
            interpret=jax.devices()[0].platform != "tpu",
        )
        stats = {}

    status = np.asarray(result.status)
    stats.update(
        batch=batch,
        horizon=horizon,
        n_converged=int((status == STATUS_CONVERGED).sum()),
        n_max_iters=int((status == STATUS_MAX_ITERS).sum()),
        n_ls_failed=int((status == STATUS_LINE_SEARCH_FAILED).sum()),
        mean_iterations=float(np.asarray(result.iterations).mean()),
        mean_cost=float(np.asarray(result.cost).mean()),
        randomized_params=bool(randomize_params),
    )
    return result, stats


def save_library(path: str, result: SolveResult, stats: dict):
    """Orbax checkpoint of the whole library (+ stats in metadata.json)."""
    from ..io.checkpoint import save_solve_result

    save_solve_result(path, result, metadata=stats)


def export_entry_proto(result: SolveResult, index: int) -> bytes:
    """One library entry as the reference's wire format
    (trajectory.proto) — consumable by the upstream C++ tooling."""
    from ..io.proto import trajectory_to_proto

    traj = jax.tree.map(lambda a: a[index], result.trajectory)
    return trajectory_to_proto(traj).SerializeToString()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dt", type=float, default=0.02)
    ap.add_argument("--pose_scale", type=float, default=0.5)
    ap.add_argument("--randomize_params", action="store_true")
    ap.add_argument("--use_mesh", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default=None, help="checkpoint dir")
    args = ap.parse_args(argv)

    t0 = time.perf_counter()
    result, stats = generate_library(
        batch=args.batch,
        horizon=args.horizon,
        iters=args.iters,
        dt_s=args.dt,
        pose_scale=args.pose_scale,
        randomize_params=args.randomize_params,
        seed=args.seed,
        use_mesh=args.use_mesh,
    )
    stats["wall_s"] = round(time.perf_counter() - t0, 2)
    if args.out:
        save_library(args.out, result, stats)
        stats["checkpoint"] = args.out
    print(json.dumps(stats))


if __name__ == "__main__":
    main(sys.argv[1:])
