"""Whole-solve single-kernel path (kernels/solve.py) vs the batch loop.

The latency kernel runs the COMPLETE iLQR loop inside one Pallas program;
these f64 interpret-mode tests pin it lane-for-lane to solve_batch_fused
(itself pinned to the vmapped XLA solver and the C++ oracle), extending the
three-way parity contract to the fourth implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.solver.batched import solve_batch_fused, solve_batch_latency
from quadrotorilqr_tpu.solver.options import (
    ConvergenceCriteria,
    ILQROptions,
    LineSearchParams,
)

from test_kernel_backward import _problem


def _assert_same(a, b):
    np.testing.assert_array_equal(np.asarray(a.status), np.asarray(b.status))
    np.testing.assert_array_equal(
        np.asarray(a.iterations), np.asarray(b.iterations)
    )
    np.testing.assert_allclose(np.asarray(a.cost), np.asarray(b.cost), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(a.trajectory.controls),
        np.asarray(b.trajectory.controls),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(a.trajectory.states.pose.quat),
        np.asarray(b.trajectory.states.pose.quat),
        atol=1e-12,
    )


def test_latency_matches_batch_loop():
    params, cost, trajs = _problem(n=6)
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 6),
    )
    a = solve_batch_fused(params, cost, trajs, 0.02, options, interpret=True)
    b = solve_batch_latency(params, cost, trajs, 0.02, options, interpret=True)
    _assert_same(a, b)


def test_latency_continuation_and_tight_budget():
    """continuation=True resumes past the trip-0 specials; max_iters budgets
    are honored exactly (including the max_iters=0 cost-only degenerate)."""
    params, cost, trajs = _problem(n=5)

    def opts(iters):
        return ILQROptions(
            convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, iters)
        )

    a1 = solve_batch_fused(params, cost, trajs, 0.02, opts(2), interpret=True)
    b1 = solve_batch_latency(params, cost, trajs, 0.02, opts(2), interpret=True)
    _assert_same(a1, b1)

    a2 = solve_batch_fused(
        params, cost, a1.trajectory, 0.02, opts(3), interpret=True,
        continuation=True,
    )
    b2 = solve_batch_latency(
        params, cost, b1.trajectory, 0.02, opts(3), interpret=True,
        continuation=True,
    )
    _assert_same(a2, b2)

    a0 = solve_batch_fused(params, cost, trajs, 0.02, opts(0), interpret=True)
    b0 = solve_batch_latency(params, cost, trajs, 0.02, opts(0), interpret=True)
    _assert_same(a0, b0)


def test_latency_per_scenario_weights_and_padding():
    """Per-lane cost operands + non-128 batch padding on the latency path."""
    from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost

    params, cost, trajs = _problem(n=4)
    batch = trajs.controls.shape[0]
    rng = np.random.default_rng(3)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, size=(batch,)), jnp.float64)
    cost_b = QuadraticTrackingCost(
        Q=scale[:, None, None] * cost.Q,
        R=jnp.broadcast_to(cost.R, (batch, 4, 4)),
        desired_states=cost.desired_states,
        desired_controls=cost.desired_controls,
    )
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 3),
    )
    a = solve_batch_fused(params, cost_b, trajs, 0.02, options, interpret=True)
    b = solve_batch_latency(params, cost_b, trajs, 0.02, options, interpret=True)
    _assert_same(a, b)

    # odd batch: pads to the tile and strips back
    sub_t = jax.tree.map(lambda x: x[:70], trajs)
    sub_c = jax.tree.map(lambda x: x[:70] if x.ndim == 3 else x, cost_b)
    r = solve_batch_latency(params, sub_c, sub_t, 0.02, options, interpret=True)
    assert r.cost.shape == (70,)
    np.testing.assert_allclose(
        np.asarray(r.cost), np.asarray(b.cost[:70]), rtol=1e-12
    )


def test_latency_populate_debug_falls_back():
    """populate_debug routes to the batch loop (identical IterDebug) instead
    of raising — the default engine serves diagnostic mode too."""
    params, cost, trajs = _problem(n=5)
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 3),
        populate_debug=True,
    )
    a = solve_batch_fused(params, cost, trajs, 0.02, options, interpret=True)
    b = solve_batch_latency(params, cost, trajs, 0.02, options, interpret=True)
    _assert_same(a, b)
    assert b.debug is not None
    np.testing.assert_array_equal(
        np.asarray(a.debug.valid), np.asarray(b.debug.valid)
    )
    np.testing.assert_allclose(
        np.asarray(a.debug.costs), np.asarray(b.debug.costs), rtol=1e-12
    )


def test_latency_long_horizon_routes_to_streamed():
    """Horizons beyond kernels.solve.MAX_HORIZON route to the streamed
    whole-solve kernel (kernels/stream.py) instead of raising — identical
    results, any horizon; ragged batches pad through the same route."""
    from quadrotorilqr_tpu.kernels.solve import MAX_HORIZON, solve_fused_whole

    n = MAX_HORIZON + 4
    params, cost, trajs = _problem(n=n)
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 1),
    )
    a = solve_batch_fused(params, cost, trajs, 0.02, options, interpret=True)
    b = solve_batch_latency(params, cost, trajs, 0.02, options, interpret=True)
    _assert_same(a, b)

    sub_t = jax.tree.map(lambda x: x[:70], trajs)
    r = solve_batch_latency(params, cost, sub_t, 0.02, options, interpret=True)
    assert r.cost.shape == (70,)
    np.testing.assert_allclose(
        np.asarray(r.cost), np.asarray(a.cost[:70]), rtol=1e-12
    )

    # the kernel entry point itself still fails fast with the actionable error
    try:
        solve_fused_whole(params, cost, trajs, 0.02, options, interpret=True)
    except ValueError as e:
        assert "VMEM budget" in str(e)
    else:
        raise AssertionError("expected ValueError beyond MAX_HORIZON")


def test_latency_zero_probe_line_search_falls_back():
    """ls max_iters=0 routes to the batch loop (the whole-solve kernels
    implement the trip-0 forced step as a forced-accept probe, so zero
    probes would silently skip it — once returned cost 0.0); the kernel
    entry points themselves fail fast."""
    from quadrotorilqr_tpu.kernels.solve import solve_fused_whole
    from quadrotorilqr_tpu.kernels.stream import solve_fused_streamed

    params, cost, trajs = _problem(n=4)
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 0),
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 2),
    )
    a = solve_batch_fused(params, cost, trajs, 0.02, options, interpret=True)
    b = solve_batch_latency(params, cost, trajs, 0.02, options, interpret=True)
    _assert_same(a, b)
    assert np.isfinite(np.asarray(b.cost)).all()
    assert (np.asarray(b.cost) > 0).all()  # real costs, not skipped probes

    for entry in (solve_fused_whole, solve_fused_streamed):
        try:
            entry(params, cost, trajs, 0.02, options, interpret=True)
        except ValueError as e:
            assert "max_iters" in str(e)
        else:
            raise AssertionError("expected ValueError for zero-probe runs")


def test_latency_per_scenario_params():
    """Per-lane physical params on the whole-solve kernel."""
    from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams

    _, cost, trajs = _problem(n=4)
    batch = trajs.controls.shape[0]
    rng = np.random.default_rng(17)
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
        g_mpss=jnp.asarray(rng.uniform(9.0, 10.5, size=(batch,)), jnp.float64),
    )
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 3),
    )
    a = solve_batch_fused(params_b, cost, trajs, 0.02, options, interpret=True)
    b = solve_batch_latency(params_b, cost, trajs, 0.02, options, interpret=True)
    _assert_same(a, b)


def test_latency_engine_serves_debug_cost_history():
    """populate_debug no longer downgrades the engine (VERDICT r2 #7): the
    whole-solve kernel emits the per-trip cost history and the CostHistory
    record bit-matches the XLA IterDebug's costs/valid buffers."""
    from quadrotorilqr_tpu.solver import CostHistory

    params, cost, trajs = _problem(n=10)
    dt = 0.02
    opts = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 12),
        populate_debug=True,
    )
    got = solve_batch_latency(params, cost, trajs, dt, opts, interpret=True)
    assert isinstance(got.debug, CostHistory)
    ref = solve_batch_fused(params, cost, trajs, dt, opts, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got.debug.valid), np.asarray(ref.debug.valid)
    )
    np.testing.assert_allclose(
        np.asarray(got.debug.costs), np.asarray(ref.debug.costs), atol=1e-9
    )
    # and the engine result itself is still the latency engine's
    np.testing.assert_array_equal(
        np.asarray(got.status), np.asarray(ref.status)
    )
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations)
    )
