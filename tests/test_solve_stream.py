"""Streamed whole-solve kernel (kernels/stream.py) vs the batch loop.

The streamed kernel runs the COMPLETE iLQR loop inside one Pallas program
with the horizon chunked through a fixed VMEM window (any N, HBM-bound).
These f64 interpret-mode tests pin it lane-for-lane to solve_batch_fused
(itself pinned to the vmapped XLA solver and the C++ oracle), extending the
parity contract to the fifth implementation. Small `chunk` values force
multiple DMA'd chunks plus a tail chunk through every sweep direction.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.kernels.stream import solve_fused_streamed
from quadrotorilqr_tpu.solver.batched import solve_batch_fused
from quadrotorilqr_tpu.solver.options import (
    ConvergenceCriteria,
    ILQROptions,
    LineSearchParams,
)

from test_kernel_backward import _problem


def _assert_same(a, b_tuple):
    """a: SolveResult from solve_batch_fused; b_tuple: streamed output."""
    traj, cost, iters, status = b_tuple
    np.testing.assert_array_equal(np.asarray(a.status), np.asarray(status))
    np.testing.assert_array_equal(np.asarray(a.iterations), np.asarray(iters))
    np.testing.assert_allclose(np.asarray(a.cost), np.asarray(cost), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(a.trajectory.controls),
        np.asarray(traj.controls),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(a.trajectory.states.pose.quat),
        np.asarray(traj.states.pose.quat),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(a.trajectory.states.pose.trans),
        np.asarray(traj.states.pose.trans),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(a.trajectory.states.vel),
        np.asarray(traj.states.vel),
        atol=1e-12,
    )


def test_streamed_matches_batch_loop_with_tail_chunk():
    """n=6 with chunk=4: one full chunk + a 2-stage tail in every sweep."""
    params, cost, trajs = _problem(n=6)
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 6),
    )
    a = solve_batch_fused(params, cost, trajs, 0.02, options, interpret=True)
    b = solve_fused_streamed(
        params, cost, trajs, 0.02, options, interpret=True, chunk=4
    )
    _assert_same(a, b)


def test_streamed_single_chunk():
    """chunk >= n degenerates to one resident window (no tail)."""
    params, cost, trajs = _problem(n=5)
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 4),
    )
    a = solve_batch_fused(params, cost, trajs, 0.02, options, interpret=True)
    b = solve_fused_streamed(
        params, cost, trajs, 0.02, options, interpret=True, chunk=64
    )
    _assert_same(a, b)


def test_streamed_exact_chunk_multiple():
    """n an exact multiple of chunk: no tail path at all."""
    params, cost, trajs = _problem(n=8)
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 3),
    )
    a = solve_batch_fused(params, cost, trajs, 0.02, options, interpret=True)
    b = solve_fused_streamed(
        params, cost, trajs, 0.02, options, interpret=True, chunk=4
    )
    _assert_same(a, b)


def test_streamed_continuation_and_tight_budget():
    """continuation resumes past the trip-0 specials; max_iters budgets are
    honored exactly (including the max_iters=0 cost-only degenerate)."""
    params, cost, trajs = _problem(n=5)

    def opts(iters):
        return ILQROptions(
            convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, iters)
        )

    a1 = solve_batch_fused(params, cost, trajs, 0.02, opts(2), interpret=True)
    b1 = solve_fused_streamed(
        params, cost, trajs, 0.02, opts(2), interpret=True, chunk=3
    )
    _assert_same(a1, b1)

    a2 = solve_batch_fused(
        params, cost, a1.trajectory, 0.02, opts(3), interpret=True,
        continuation=True,
    )
    b2 = solve_fused_streamed(
        params, cost, b1[0], 0.02, opts(3), interpret=True,
        continuation=True, chunk=3,
    )
    _assert_same(a2, b2)

    a0 = solve_batch_fused(params, cost, trajs, 0.02, opts(0), interpret=True)
    b0 = solve_fused_streamed(
        params, cost, trajs, 0.02, opts(0), interpret=True, chunk=3
    )
    _assert_same(a0, b0)


def test_streamed_per_scenario_weights():
    """Per-lane cost operands stream through the batched desired buffer."""
    from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost

    params, cost, trajs = _problem(n=6)
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
    b = solve_fused_streamed(
        params, cost_b, trajs, 0.02, options, interpret=True, chunk=4
    )
    _assert_same(a, b)


def test_streamed_per_scenario_params():
    """Per-lane physical params on the streamed kernel."""
    from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams

    _, cost, trajs = _problem(n=5)
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
    b = solve_fused_streamed(
        params_b, cost, trajs, 0.02, options, interpret=True, chunk=4
    )
    _assert_same(a, b)


def test_streamed_line_search_failure_lanes():
    """A starved line search (1 probe, near-1.0 required reduction) drives
    lanes to STATUS_LINE_SEARCH_FAILED; the streamed kernel must freeze and
    report them exactly like the batch loop (the reference throws here,
    ilqr.hh:191-193 — batched engines surface a per-lane status instead)."""
    params, cost, trajs = _problem(n=5)
    # demand 2x the model-predicted reduction with a single probe: trip 0
    # always applies (ilqr.hh:71-73), trip 1's line search then fails
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 2.0, 1),
        convergence_criteria=ConvergenceCriteria(1e-12, 1e-12, 4),
    )
    a = solve_batch_fused(params, cost, trajs, 0.02, options, interpret=True)
    b = solve_fused_streamed(
        params, cost, trajs, 0.02, options, interpret=True, chunk=3
    )
    _assert_same(a, b)
    assert (np.asarray(a.status) == 2).any(), (
        "fixture no longer produces line-search failures; tighten it"
    )


def test_streamed_rejects_ragged_batch():
    params, cost, trajs = _problem(n=4)
    sub_t = jax.tree.map(lambda x: x[:70], trajs)
    sub_c = jax.tree.map(lambda x: x[:70] if x.ndim == 3 else x, cost)
    try:
        solve_fused_streamed(
            params, sub_c, sub_t, 0.02, ILQROptions(), interpret=True
        )
    except ValueError as e:
        assert "multiple" in str(e)
    else:
        raise AssertionError("expected ValueError for non-tile batch")
