"""Batching + sharding tests on the 8-virtual-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.app import workloads
from quadrotorilqr_tpu.costs import QuadraticTrackingCost
from quadrotorilqr_tpu.models import quadrotor as qm
from quadrotorilqr_tpu.parallel import (
    batch_stats,
    initial_trajectory_from_state,
    make_scenario_mesh,
    solve_batch,
    solve_sharded,
    solve_sharded_with_stats,
)
from quadrotorilqr_tpu.solver import ILQROptions, ilqr_module
from quadrotorilqr_tpu.solver.options import ConvergenceCriteria

F64 = jnp.float64
B = 16
N = 20


def make_problem():
    key = jax.random.PRNGKey(0)
    x0, desired = workloads.hover_to_waypoint(key, B, n=N, dt_s=0.05, dtype=F64, pose_scale=0.3)
    params = qm.QuadrotorParams.create(1.0, jnp.eye(3, dtype=F64), 1.0, 0.017, 9.81)
    q = jnp.diag(jnp.concatenate([10.0 * jnp.ones(6, F64), jnp.ones(6, F64)]))
    r = 0.1 * jnp.eye(4, dtype=F64)
    cost = QuadraticTrackingCost(
        Q=q, R=r, desired_states=desired.states, desired_controls=desired.controls
    )
    trajs = initial_trajectory_from_state(x0, desired)
    opts = ILQROptions(convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 30))
    return params, cost, trajs, opts


class TestBatch:
    def test_solve_batch_matches_loop(self):
        params, cost, trajs, opts = make_problem()
        batched = solve_batch(params, cost, trajs, 0.05, opts)
        for i in [0, 7, B - 1]:
            single = ilqr_module.solve(
                params, cost, jax.tree.map(lambda leaf: leaf[i], trajs), 0.05, opts
            )
            np.testing.assert_allclose(
                np.asarray(batched.trajectory.controls[i]),
                np.asarray(single.trajectory.controls),
                atol=1e-8,
            )
            assert int(batched.status[i]) == int(single.status)
            assert int(batched.iterations[i]) == int(single.iterations)

    def test_batch_stats(self):
        params, cost, trajs, opts = make_problem()
        result = solve_batch(params, cost, trajs, 0.05, opts)
        stats = batch_stats(result)
        assert stats["num_scenarios"] == B
        assert 0.0 <= float(stats["frac_converged"]) <= 1.0
        assert float(stats["mean_iterations"]) > 0

    def test_per_scenario_cost_weights(self):
        """BASELINE.json config 3: per-scenario Q scaling changes solutions."""
        params, cost, trajs, opts = make_problem()
        scales = jnp.linspace(0.5, 5.0, B, dtype=F64)[:, None, None]
        cost_b = QuadraticTrackingCost(
            Q=scales * cost.Q,
            R=jnp.broadcast_to(cost.R, (B, 4, 4)),
            desired_states=jax.tree.map(
                lambda leaf: jnp.broadcast_to(leaf, (B,) + leaf.shape), cost.desired_states
            ),
            desired_controls=jnp.broadcast_to(
                cost.desired_controls, (B,) + cost.desired_controls.shape
            ),
        )
        result = solve_batch(params, cost_b, trajs, 0.05, opts, cost_batched=True)
        costs = np.asarray(result.cost)
        assert np.unique(costs).size == B  # every scenario genuinely different


class TestSharded:
    def test_mesh_has_8_devices(self):
        mesh = make_scenario_mesh()
        assert mesh.devices.size == 8

    def test_solve_sharded_matches_batch(self):
        params, cost, trajs, opts = make_problem()
        mesh = make_scenario_mesh()
        sharded = solve_sharded(params, cost, trajs, 0.05, opts, mesh)
        local = solve_batch(params, cost, trajs, 0.05, opts)
        np.testing.assert_allclose(
            np.asarray(sharded.trajectory.controls),
            np.asarray(local.trajectory.controls),
            atol=1e-8,
        )
        # verify it actually sharded over the scenario axis
        shard_sizes = {s.data.shape[0] for s in sharded.cost.addressable_shards}
        assert shard_sizes == {B // 8}

    def test_solve_sharded_with_stats_psum(self):
        params, cost, trajs, opts = make_problem()
        mesh = make_scenario_mesh()
        result, stats = solve_sharded_with_stats(params, cost, trajs, 0.05, opts, mesh)
        local = solve_batch(params, cost, trajs, 0.05, opts)
        local_stats = batch_stats(local)
        np.testing.assert_allclose(
            float(stats["n_converged"]),
            float(local_stats["frac_converged"]) * B,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            float(stats["mean_cost"]), float(local_stats["mean_cost"]), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(result.trajectory.controls),
            np.asarray(local.trajectory.controls),
            atol=1e-8,
        )


class TestShardedPerScenario:
    """Per-scenario params/cost sharded along the scenario axis (instead of
    replicated) through the mesh helpers."""

    @staticmethod
    def _batched_operands(params, cost):
        rng = np.random.default_rng(23)
        masses = jnp.asarray(rng.uniform(0.8, 1.5, size=(B,)), F64)
        inertias = jnp.asarray(
            np.stack([np.eye(3) * s for s in rng.uniform(0.5, 2.0, size=B)]),
            F64,
        )
        params_b = qm.QuadrotorParams(
            mass_kg=masses,
            inertia=inertias,
            arm_length_m=jnp.broadcast_to(params.arm_length_m, (B,)),
            torque_to_thrust_ratio_m=jnp.broadcast_to(
                params.torque_to_thrust_ratio_m, (B,)
            ),
            g_mpss=jnp.broadcast_to(params.g_mpss, (B,)),
        )
        scales = jnp.linspace(0.5, 5.0, B, dtype=F64)[:, None, None]
        cost_b = QuadraticTrackingCost(
            Q=scales * cost.Q,
            R=cost.R,  # mixed: Q per-scenario, R/desired shared
            desired_states=cost.desired_states,
            desired_controls=cost.desired_controls,
        )
        return params_b, cost_b

    def test_solve_sharded_per_scenario(self):
        from quadrotorilqr_tpu.parallel.batch import solve_batch as sb

        params, cost, trajs, opts = make_problem()
        params_b, cost_b = self._batched_operands(params, cost)
        mesh = make_scenario_mesh()
        sharded = solve_sharded(params_b, cost_b, trajs, 0.05, opts, mesh)
        local = sb(
            params_b, cost_b, trajs, 0.05, opts,
            params_batched=True, cost_batched=True,
        )
        np.testing.assert_allclose(
            np.asarray(sharded.trajectory.controls),
            np.asarray(local.trajectory.controls),
            atol=1e-8,
        )
        # params really landed sharded, not replicated
        shard_sizes = {s.data.shape[0] for s in sharded.cost.addressable_shards}
        assert shard_sizes == {B // 8}

    def test_solve_sharded_with_stats_per_scenario(self):
        from quadrotorilqr_tpu.parallel.batch import solve_batch as sb

        params, cost, trajs, opts = make_problem()
        params_b, cost_b = self._batched_operands(params, cost)
        mesh = make_scenario_mesh()
        result, stats = solve_sharded_with_stats(
            params_b, cost_b, trajs, 0.05, opts, mesh
        )
        local = sb(
            params_b, cost_b, trajs, 0.05, opts,
            params_batched=True, cost_batched=True,
        )
        np.testing.assert_allclose(
            np.asarray(result.trajectory.controls),
            np.asarray(local.trajectory.controls),
            atol=1e-8,
        )
        np.testing.assert_allclose(
            float(stats["total_cost"]), float(jnp.sum(local.cost)), rtol=1e-10
        )


def test_solve_batch_per_scenario_params():
    """params_batched: randomized mass/inertia per scenario (domain
    randomization) through the vmapped XLA path."""
    import numpy as np

    from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams
    from quadrotorilqr_tpu.parallel.batch import solve_batch

    params1, cost, trajs, opts = make_problem()
    nb = 4
    trajs = jax.tree.map(lambda a: a[:nb], trajs)
    rng = np.random.default_rng(11)
    masses = jnp.asarray(rng.uniform(0.8, 1.5, size=(nb,)), F64)
    inertias = jnp.asarray(
        np.stack([np.eye(3) * s for s in rng.uniform(0.5, 2.0, size=nb)]), F64
    )
    params_b = QuadrotorParams(
        mass_kg=masses,
        inertia=inertias,
        arm_length_m=jnp.broadcast_to(params1.arm_length_m, (nb,)),
        torque_to_thrust_ratio_m=jnp.broadcast_to(
            params1.torque_to_thrust_ratio_m, (nb,)
        ),
        g_mpss=jnp.broadcast_to(params1.g_mpss, (nb,)),
    )
    res = solve_batch(params_b, cost, trajs, 0.05, opts, params_batched=True)
    assert res.cost.shape == (nb,)
    # per-scenario solve with scenario i's params matches lane i
    for i in (0, 3):
        pi = jax.tree.map(lambda a: a[i], params_b)
        ti = jax.tree.map(lambda a: a[i : i + 1], trajs)
        ri = solve_batch(pi, cost, ti, 0.05, opts)
        np.testing.assert_allclose(
            float(res.cost[i]), float(ri.cost[0]), rtol=1e-10
        )


def test_solve_batch_populate_debug():
    """Per-iteration debug buffers work under the vmapped batch path
    (SURVEY.md §5.5 observability, batched)."""
    from quadrotorilqr_tpu.app import workloads as wl

    params, cost, trajs, _ = make_problem()
    sub = jax.tree.map(lambda a: a[:4], trajs)
    opts = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 3),
        populate_debug=True,
    )
    res = solve_batch(params, cost, sub, 0.05, opts)
    assert res.debug is not None
    assert res.debug.costs.shape == (4, 3)
    assert res.debug.trajectories.controls.shape == (4, 3, N, 4)
    valid = np.asarray(res.debug.valid)
    iters = np.asarray(res.iterations)
    # one debug slot per executed update, per lane
    np.testing.assert_array_equal(valid.sum(axis=1), iters)


def test_sharded_per_scenario_stage_weights():
    """Per-scenario stage weights ((B, N)) shard correctly over the mesh on
    both the GSPMD and shard_map(+psum) paths."""
    from dataclasses import replace

    params, cost, trajs, opts = make_problem()
    rng = np.random.default_rng(7)
    w = jnp.asarray(0.5 + rng.random((B, N)), F64)
    cost_w = replace(cost, stage_weights=w)
    ref = solve_batch(params, cost_w, trajs, 0.05, opts, cost_batched=True)

    mesh = make_scenario_mesh()
    g = solve_sharded(params, cost_w, trajs, 0.05, opts, mesh)
    np.testing.assert_allclose(
        np.asarray(g.cost), np.asarray(ref.cost), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(g.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-9,
    )

    s, stats = solve_sharded_with_stats(params, cost_w, trajs, 0.05, opts, mesh)
    np.testing.assert_allclose(
        np.asarray(s.cost), np.asarray(ref.cost), rtol=1e-10
    )
    assert float(stats["n_converged"]) == float(
        (np.asarray(ref.status) == 1).sum()
    )
