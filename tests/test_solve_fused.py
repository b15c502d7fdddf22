"""solve_batch_fused (Pallas kernels, interpret mode) vs vmapped XLA solve."""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.parallel.batch import solve_batch
from quadrotorilqr_tpu.solver.batched import solve_batch_fused
from quadrotorilqr_tpu.solver.options import (
    ConvergenceCriteria,
    ILQROptions,
    LineSearchParams,
)

from test_kernel_backward import _problem


def test_solve_fused_matches_vmapped_xla():
    params, cost, trajs = _problem(n=6)
    dt = 0.02
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 6),
    )

    fused = solve_batch_fused(params, cost, trajs, dt, options, interpret=True)
    ref = solve_batch(params, cost, trajs, dt, options)

    np.testing.assert_array_equal(np.asarray(fused.status), np.asarray(ref.status))
    np.testing.assert_array_equal(
        np.asarray(fused.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(fused.cost), np.asarray(ref.cost), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(fused.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(fused.trajectory.states.pose.trans),
        np.asarray(ref.trajectory.states.pose.trans),
        atol=1e-7,
    )


def test_solve_fused_sharded_cpu_mesh():
    """Fused solver under shard_map on the 8-device CPU mesh (interpret)."""
    import jax

    from quadrotorilqr_tpu.parallel.mesh import (
        make_scenario_mesh,
        solve_sharded_fused,
    )

    n_dev = len(jax.devices())
    assert n_dev == 8
    params, cost, trajs = _problem(n=4)
    # 8 shards x 128-lane tile = 1024 total scenarios
    trajs = jax.tree.map(
        lambda a: jnp.concatenate([a] * n_dev, axis=0), trajs
    )
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 2),
    )
    mesh = make_scenario_mesh()
    result, stats = solve_sharded_fused(
        params, cost, trajs, 0.02, options, mesh, interpret=True
    )
    assert result.cost.shape == (n_dev * 128,)
    # every shard solves the same 128 scenarios -> global stats = 8x one shard
    ref = solve_batch_fused(
        params, cost, jax.tree.map(lambda a: a[:128], trajs), 0.02, options,
        interpret=True,
    )
    np.testing.assert_allclose(
        float(stats["total_cost"]), float(jnp.sum(ref.cost)) * n_dev, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(result.cost[:128]), np.asarray(ref.cost), rtol=1e-8
    )


def test_solve_fused_per_scenario_weights():
    """Per-scenario Q/R scaling (config 3) vs the vmapped XLA path."""
    params, cost, trajs = _problem(n=5)
    batch = trajs.controls.shape[0]
    rng = np.random.default_rng(7)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, size=(batch,)), jnp.float64)
    from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost

    cost_b = QuadraticTrackingCost(
        Q=scale[:, None, None] * cost.Q,
        R=jnp.broadcast_to(cost.R, (batch, 4, 4)),
        desired_states=cost.desired_states,
        desired_controls=cost.desired_controls,
    )
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 4),
    )
    fused = solve_batch_fused(params, cost_b, trajs, 0.02, options, interpret=True)
    ref = solve_batch(
        params, cost_b, trajs, 0.02, options, cost_batched=True
    )
    np.testing.assert_array_equal(np.asarray(fused.status), np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(fused.cost), np.asarray(ref.cost), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(fused.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-7,
    )


def test_solve_fused_per_scenario_params():
    """Per-scenario physical params (Monte-Carlo over mass/inertia/arm/g,
    quadrotor_model.hh:7-9) on the fused path vs the vmapped XLA path."""
    from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams

    _, cost, trajs = _problem(n=5)
    batch = trajs.controls.shape[0]
    rng = np.random.default_rng(13)
    # randomized diagonal-dominant SPD inertias + scalar param spreads
    diags = rng.uniform(0.3, 0.8, size=(batch, 3))
    inertias = np.zeros((batch, 3, 3))
    for i in range(batch):
        inertias[i] = np.diag(diags[i]) + 0.02
    params_b = QuadrotorParams(
        mass_kg=jnp.asarray(rng.uniform(0.8, 1.6, size=(batch,)), jnp.float64),
        inertia=jnp.asarray(inertias, jnp.float64),
        arm_length_m=jnp.asarray(rng.uniform(0.15, 0.3, size=(batch,)), jnp.float64),
        torque_to_thrust_ratio_m=jnp.asarray(
            rng.uniform(0.01, 0.02, size=(batch,)), jnp.float64
        ),
        g_mpss=jnp.asarray(rng.uniform(9.0, 10.5, size=(batch,)), jnp.float64),
    )
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 4),
    )
    fused = solve_batch_fused(params_b, cost, trajs, 0.02, options, interpret=True)
    ref = solve_batch(params_b, cost, trajs, 0.02, options, params_batched=True)
    np.testing.assert_array_equal(np.asarray(fused.status), np.asarray(ref.status))
    np.testing.assert_array_equal(
        np.asarray(fused.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_allclose(np.asarray(fused.cost), np.asarray(ref.cost), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(fused.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-7,
    )
    # params genuinely differentiate the lanes
    assert np.unique(np.asarray(fused.cost)).size == batch


def test_solve_fused_quu_regularization():
    """quu_reg > 0 (robust mode): fused and XLA paths still agree."""
    params, cost, trajs = _problem(n=5)
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 4),
        quu_reg=1e-4,
    )
    fused = solve_batch_fused(params, cost, trajs, 0.02, options, interpret=True)
    ref = solve_batch(params, cost, trajs, 0.02, options)
    np.testing.assert_array_equal(np.asarray(fused.status), np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(fused.cost), np.asarray(ref.cost), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(fused.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-7,
    )


def test_solve_fused_populate_debug():
    """Per-iteration debug on the fused path == the vmapped XLA path's
    (ilqr.hh:78-80 semantics), and one lane's record round-trips through the
    reference-compatible debug proto."""
    from quadrotorilqr_tpu.io.proto import debug_from_proto, debug_to_proto

    params, cost, trajs = _problem(n=5)
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 4),
        populate_debug=True,
    )
    fused = solve_batch_fused(params, cost, trajs, 0.02, options, interpret=True)
    ref = solve_batch(params, cost, trajs, 0.02, options)
    assert fused.debug is not None
    np.testing.assert_array_equal(
        np.asarray(fused.debug.valid), np.asarray(ref.debug.valid)
    )
    valid = np.asarray(fused.debug.valid)
    np.testing.assert_allclose(
        np.asarray(fused.debug.costs)[valid],
        np.asarray(ref.debug.costs)[valid],
        rtol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(fused.debug.trajectories.controls)[valid],
        np.asarray(ref.debug.trajectories.controls)[valid],
        atol=1e-7,
    )
    # per-lane slot count == executed updates
    np.testing.assert_array_equal(
        valid.sum(axis=1), np.asarray(fused.iterations)
    )

    # proto round trip of lane 0's record (reference ilqr_debug.proto wire)
    lane0 = jax.tree.map(lambda a: a[0], fused.debug)
    msg = debug_to_proto(lane0)
    trajs_back, costs_back = debug_from_proto(msg)
    assert len(trajs_back) == int(fused.iterations[0])
    np.testing.assert_allclose(
        np.asarray(trajs_back[-1].controls),
        np.asarray(fused.debug.trajectories.controls[0][valid[0]][-1]),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        costs_back[-1], float(fused.cost[0]), rtol=1e-10
    )


def test_solve_refine_matches_single_phase():
    """Two-phase compacted solve == single-phase solve, lane for lane."""
    from quadrotorilqr_tpu.solver.batched import solve_batch_refine

    params, cost, trajs = _problem(n=5)
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, 6),
    )
    single = solve_batch_fused(params, cost, trajs, 0.02, options, interpret=True)
    two = solve_batch_refine(
        params, cost, trajs, 0.02, options, phase1_iters=2, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(two.status), np.asarray(single.status))
    np.testing.assert_array_equal(
        np.asarray(two.iterations), np.asarray(single.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(two.cost), np.asarray(single.cost), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(two.trajectory.controls),
        np.asarray(single.trajectory.controls),
        atol=1e-12,
    )


def test_solve_fused_per_scenario_desired_shared_weights():
    """Regression (review finding): per-scenario desired trajectories with
    SHARED Q/R must route through the per-lane cost path, not crash."""
    from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
    from quadrotorilqr_tpu.models.quadrotor import State
    from quadrotorilqr_tpu.lie.se3 import SE3

    params, cost, trajs = _problem(n=4)
    batch = trajs.controls.shape[0]
    # jitter the desired translation per scenario
    rng = np.random.default_rng(5)
    offs = jnp.asarray(rng.normal(scale=0.05, size=(batch, 1, 3)), jnp.float64)
    des_b = QuadraticTrackingCost(
        Q=cost.Q,  # shared
        R=cost.R,  # shared
        desired_states=State(
            pose=SE3(
                quat=jnp.broadcast_to(
                    cost.desired_states.pose.quat, (batch, 4, 4)
                ),
                trans=cost.desired_states.pose.trans + offs,
            ),
            vel=jnp.broadcast_to(cost.desired_states.vel, (batch, 4, 6)),
        ),
        desired_controls=jnp.broadcast_to(cost.desired_controls, (batch, 4, 4)),
    )
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 3),
    )
    fused = solve_batch_fused(params, des_b, trajs, 0.02, options, interpret=True)
    ref = solve_batch(params, des_b, trajs, 0.02, options, cost_batched=True)
    np.testing.assert_allclose(np.asarray(fused.cost), np.asarray(ref.cost), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(fused.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-7,
    )


def test_solve_fused_tile_skip_multi_tile():
    """Per-tile activity skipping with a FULLY-FROZEN tile: lanes 0..127
    enter with status=CONVERGED (initial_status), so tile 0's backward and
    rollout kernels are skipped on EVERY trip while tile 1 computes — the
    skipped tile's stale outputs must never leak (frozen lanes pass through
    unchanged; active lanes match a solo solve of their tile)."""
    from quadrotorilqr_tpu.solver.ilqr import STATUS_CONVERGED, STATUS_MAX_ITERS

    params, cost, trajs = _problem(n=4)
    both = jax.tree.map(
        lambda a: jnp.concatenate([a, a], axis=0), trajs
    )
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, 4),
    )
    status0 = jnp.concatenate(
        [
            jnp.full((128,), STATUS_CONVERGED, jnp.int32),
            jnp.full((128,), STATUS_MAX_ITERS, jnp.int32),
        ]
    )
    init_cost = jnp.full((256,), 123.25)  # frozen lanes carry this through
    res = solve_batch_fused(
        params, cost, both, 0.02, options, interpret=True,
        continuation=True, initial_cost=init_cost, initial_status=status0,
    )
    # frozen tile: untouched trajectory/cost/status, zero iterations
    np.testing.assert_allclose(
        np.asarray(res.trajectory.controls[:128]),
        np.asarray(both.controls[:128]),
        rtol=0, atol=0,
    )
    np.testing.assert_allclose(np.asarray(res.cost[:128]), 123.25)
    assert (np.asarray(res.status[:128]) == STATUS_CONVERGED).all()
    assert (np.asarray(res.iterations[:128]) == 0).all()
    # active tile: identical to a solo continuation solve of the same lanes
    solo = solve_batch_fused(
        params, cost, trajs, 0.02, options, interpret=True,
        continuation=True, initial_cost=init_cost[128:],
        initial_status=status0[128:],
    )
    np.testing.assert_array_equal(
        np.asarray(res.status[128:]), np.asarray(solo.status)
    )
    np.testing.assert_array_equal(
        np.asarray(res.iterations[128:]), np.asarray(solo.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(res.cost[128:]), np.asarray(solo.cost), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res.trajectory.controls[128:]),
        np.asarray(solo.trajectory.controls),
        atol=1e-12,
    )


def test_solve_fused_auto_pads_odd_batches():
    """Batches that aren't 128-multiples pad to the tile and strip back."""
    params, cost, trajs = _problem(n=4)
    sub = jax.tree.map(lambda a: a[:100], trajs)  # 100 lanes
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 3),
    )
    res = solve_batch_fused(params, cost, sub, 0.02, options, interpret=True)
    full = solve_batch_fused(params, cost, trajs, 0.02, options, interpret=True)
    assert res.cost.shape == (100,)
    np.testing.assert_allclose(
        np.asarray(res.cost), np.asarray(full.cost[:100]), rtol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(res.status), np.asarray(full.status[:100])
    )


def test_solve_fused_sharded_per_scenario_operands():
    """Per-scenario params + mixed per-scenario cost through the sharded
    fused path (shard_map operands sharded along the scenario axis) vs the
    single-device fused solve on the same global batch."""
    from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
    from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams
    from quadrotorilqr_tpu.parallel.mesh import (
        make_scenario_mesh,
        solve_sharded_fused,
    )

    n_dev = len(jax.devices())
    assert n_dev == 8
    params1, cost, trajs = _problem(n=4)
    batch = 128 * n_dev
    trajs = jax.tree.map(lambda a: jnp.concatenate([a] * n_dev, axis=0), trajs)
    rng = np.random.default_rng(29)
    diags = rng.uniform(0.3, 0.8, size=(batch, 3))
    inertias = np.stack([np.diag(d) + 0.02 for d in diags])
    params_b = QuadrotorParams(
        mass_kg=jnp.asarray(rng.uniform(0.8, 1.6, size=(batch,)), jnp.float64),
        inertia=jnp.asarray(inertias, jnp.float64),
        arm_length_m=jnp.asarray(
            rng.uniform(0.15, 0.3, size=(batch,)), jnp.float64
        ),
        torque_to_thrust_ratio_m=jnp.asarray(
            rng.uniform(0.01, 0.02, size=(batch,)), jnp.float64
        ),
        g_mpss=jnp.full((batch,), 9.81, jnp.float64),
    )
    scale = jnp.asarray(rng.uniform(0.5, 2.0, size=(batch,)), jnp.float64)
    cost_b = QuadraticTrackingCost(
        Q=scale[:, None, None] * cost.Q,
        R=cost.R,  # mixed: Q per-scenario, R/desired shared
        desired_states=cost.desired_states,
        desired_controls=cost.desired_controls,
    )
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 2),
    )
    mesh = make_scenario_mesh()
    result, stats = solve_sharded_fused(
        params_b, cost_b, trajs, 0.02, options, mesh, interpret=True
    )
    ref = solve_batch_fused(
        params_b, cost_b, trajs, 0.02, options, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(result.status), np.asarray(ref.status)
    )
    np.testing.assert_allclose(
        np.asarray(result.cost), np.asarray(ref.cost), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(result.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        float(stats["total_cost"]), float(jnp.sum(ref.cost)), rtol=1e-8
    )
    # randomized params genuinely differentiate lanes across shards
    assert np.unique(np.asarray(result.cost)).size > batch // 2
