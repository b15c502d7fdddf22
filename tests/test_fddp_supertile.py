"""Supertile layout of the FDDP whole-solve kernel (kernels/fddp.py
supertile=True) — the dense-register throughput variant, applied to the
ROBUST solver (VERDICT r4 #1).

As with the exact loop (tests/test_supertile.py), the kernel BODY is the
same code as the minor-lane layout — the lane algebra and the shared stage
math are trailing-shape agnostic — so parity here certifies the layout
transform (kernels/solve.py _to_super/_from_super + the supertile
BlockSpecs threaded through _fddp_call), not re-derived math. The lane
reference is itself lane-for-lane equal to vmap(solver.fddp.solve_fddp)
(tests/test_fddp_fused.py), so this suite chains to the XLA contract."""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models import quadrotor as qm
from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
from quadrotorilqr_tpu.solver import ILQROptions, Trajectory
from quadrotorilqr_tpu.solver.batched import (
    _supertile_horizon_budget,
    solve_batch_fddp,
    solve_batch_fddp_refine,
)
from quadrotorilqr_tpu.solver.options import (
    ConvergenceCriteria,
    LineSearchParams,
)

F64 = jnp.float64

_OPTS = ILQROptions(
    line_search_params=LineSearchParams(0.5, 0.5, 20),
    convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 25),
)


def _mixed_problem(batch, n=10, dt=0.12, seed=0, hard_scale=1.8,
                   per_scenario=False):
    """Half benign, half aggressive-tumble lanes (the
    tests/test_fddp_fused.py workload shape): hard lanes burn adaptive-mu
    retries and Goldstein rejections while benign neighbors freeze early —
    the machinery the layout transform must not disturb."""
    params = qm.QuadrotorParams.create(
        1.0, jnp.asarray(np.diag([0.01, 0.012, 0.02]), F64), 0.17, 0.016,
        9.81,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    scale = jnp.where(jnp.arange(batch) % 2 == 0, 0.4, hard_scale)[:, None]
    x0 = qm.State(
        pose=se3.exp(scale * jax.random.normal(k1, (batch, 6), F64)),
        vel=scale * jax.random.normal(k2, (batch, 6), F64),
    )
    hover = jnp.full((n, 4), 9.81 / 4.0, F64)
    desired = Trajectory(
        times=dt * jnp.arange(n, dtype=F64),
        states=qm.State(
            pose=se3.identity((n,), F64), vel=jnp.zeros((n, 6), F64)
        ),
        controls=hover,
    )
    q = jnp.diag(jnp.asarray([100.0] * 6 + [1.0] * 6, F64))
    if per_scenario:
        rng = np.random.default_rng(7)
        q = jnp.asarray(
            rng.uniform(0.5, 2.0, size=(batch,)), F64
        )[:, None, None] * q
        params = qm.QuadrotorParams(
            mass_kg=jnp.asarray(rng.uniform(0.8, 1.4, size=(batch,)), F64),
            inertia=jnp.broadcast_to(params.inertia, (batch, 3, 3)),
            arm_length_m=jnp.broadcast_to(params.arm_length_m, (batch,)),
            torque_to_thrust_ratio_m=jnp.broadcast_to(
                params.torque_to_thrust_ratio_m, (batch,)
            ),
            g_mpss=jnp.broadcast_to(params.g_mpss, (batch,)),
        )
    cost = QuadraticTrackingCost(
        Q=q,
        R=1e-3 * jnp.eye(4, dtype=F64),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    return params, cost, initial_trajectory_from_state(x0, desired), dt


def _assert_parity(got, ref):
    np.testing.assert_array_equal(
        np.asarray(got.status), np.asarray(ref.status)
    )
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-10, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(got.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-8,
    )


def test_fddp_supertile_matches_lane_layout():
    """Multi-supertile batch (2048 = 2 grid steps), shared operands; the
    mixed class must exercise retries (iteration spread) on both layouts."""
    params, cost, trajs, dt = _mixed_problem(2048)
    ref = solve_batch_fddp(params, cost, trajs, dt, _OPTS, interpret=True)
    got = solve_batch_fddp(
        params, cost, trajs, dt, _OPTS, interpret=True, supertile=True
    )
    _assert_parity(got, ref)
    assert int((np.asarray(ref.status) == 1).sum()) > 1024
    it = np.asarray(ref.iterations)
    assert it.max() > it.min()


def test_fddp_supertile_per_scenario_operands():
    """Per-scenario params + cost leaves ride the same sublane packing."""
    params, cost, trajs, dt = _mixed_problem(1024, per_scenario=True)
    ref = solve_batch_fddp(params, cost, trajs, dt, _OPTS, interpret=True)
    got = solve_batch_fddp(
        params, cost, trajs, dt, _OPTS, interpret=True, supertile=True
    )
    _assert_parity(got, ref)
    assert np.unique(np.asarray(got.cost)).size > 512


def test_fddp_supertile_pads_partial_batches():
    params, cost, trajs, dt = _mixed_problem(1500)
    ref = solve_batch_fddp(params, cost, trajs, dt, _OPTS, interpret=True)
    got = solve_batch_fddp(
        params, cost, trajs, dt, _OPTS, interpret=True, supertile=True
    )
    _assert_parity(got, ref)


def test_fddp_supertile_box_limits_and_weights():
    from dataclasses import replace

    params, cost, trajs, dt = _mixed_problem(1024, hard_scale=1.2)
    cost = replace(
        cost,
        stage_weights=jnp.asarray([1.0] * 9 + [4.0], F64),
    )
    lim = (0.0, 6.0)
    ref = solve_batch_fddp(
        params, cost, trajs, dt, _OPTS, interpret=True, limits=lim
    )
    got = solve_batch_fddp(
        params, cost, trajs, dt, _OPTS, interpret=True, limits=lim,
        supertile=True,
    )
    _assert_parity(got, ref)
    u = np.asarray(got.trajectory.controls)
    assert u.max() <= 6.0 + 1e-12 and u.min() >= -1e-12


def test_fddp_supertile_ddp_curvature():
    """The analytic exact-DDP curvature rides the supertile layout."""
    params, cost, trajs, dt = _mixed_problem(1024, hard_scale=1.2)
    ref = solve_batch_fddp(
        params, cost, trajs, dt, _OPTS, interpret=True, ddp=True
    )
    got = solve_batch_fddp(
        params, cost, trajs, dt, _OPTS, interpret=True, ddp=True,
        supertile=True,
    )
    _assert_parity(got, ref)


def test_fddp_supertile_refine_hybrid():
    """The multi-phase compacted driver + per-phase hybrid curvature runs
    every VMEM-kernel phase in the supertile layout; phase boundaries
    permute lanes OUTSIDE the kernels, so resume rows are layout-blind."""
    params, cost, trajs, dt = _mixed_problem(1024)
    ref = solve_batch_fddp_refine(
        params, cost, trajs, dt, _OPTS, phase1_iters=(8,),
        ddp=(False, True), interpret=True,
    )
    got = solve_batch_fddp_refine(
        params, cost, trajs, dt, _OPTS, phase1_iters=(8,),
        ddp=(False, True), interpret=True, supertile=True,
    )
    _assert_parity(got, ref)


def test_fddp_supertile_substepped_model():
    """Substepped (chained Lie-Euler) models run in the supertile layout."""
    from quadrotorilqr_tpu.models.integrators import substepped

    params, cost, trajs, dt = _mixed_problem(1024, hard_scale=1.0)
    model = substepped(qm, 2)
    ref = solve_batch_fddp(
        params, cost, trajs, dt, _OPTS, interpret=True, model=model
    )
    got = solve_batch_fddp(
        params, cost, trajs, dt, _OPTS, interpret=True, model=model,
        supertile=True,
    )
    _assert_parity(got, ref)


def test_supertile_horizon_budget():
    """The VMEM guard demotes horizons past the measured envelope. Only
    STAGE-WISE batched operands (per-scenario desired targets / stage
    weights — (N, d) rows per lane per grid step) shrink the budget;
    per-scenario Q/R and params are stage-constant tiles (~1 MB/step) and
    keep the full 200-stage envelope — the CostBatched split is what
    unstuck config 3 (measured: N=200 + per-scenario Q/R compiles and
    runs supertile on the chip)."""
    from dataclasses import replace

    params, cost, _, _ = _mixed_problem(128)
    # exact loop at u=4: the measured 200/128-stage envelope
    assert _supertile_horizon_budget(cost, params, 4, rows_base=48) == 200
    # FDDP adds the 12-row defect scratch -> rows 124 at u=4
    assert _supertile_horizon_budget(cost, params, 4, rows_base=60) == 180
    pb, cb, _, _ = _mixed_problem(128, per_scenario=True)
    # per-scenario Q + params (the config-3 shape class): full budget
    assert _supertile_horizon_budget(cb, pb, 4, rows_base=48) == 200
    assert _supertile_horizon_budget(cb, pb, 4, rows_base=60) == 180
    # per-scenario DESIRED targets: the stagewise 128-stage budget
    des_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (128,) + a.shape), cost.desired_states
    )
    cost_des = replace(cost, desired_states=des_b)
    assert _supertile_horizon_budget(cost_des, params, 4, rows_base=48) == 128
    # per-scenario stage weights likewise
    cost_w = replace(
        cost, stage_weights=jnp.ones((128, 10), jnp.float64)
    )
    assert _supertile_horizon_budget(cost_w, params, 4, rows_base=60) == 115


def test_streamed_supertile_matches_lane_layout():
    """The STREAMED kernels (HBM-windowed, any horizon) ride the supertile
    layout too (round 5: the packed streams gain a sublane dim; DMA slices
    stay (8,128)-tile aligned) — exact loop and FDDP both."""
    from tests.test_supertile import _OPTS as EOPTS
    from tests.test_supertile import _problem
    from quadrotorilqr_tpu.kernels.stream import solve_fused_streamed
    from quadrotorilqr_tpu.kernels.stream_fddp import solve_fddp_streamed

    params, cost, trajs, dt = _problem(1024, n=7)
    ref = solve_fused_streamed(
        params, cost, trajs, dt, EOPTS, interpret=True, chunk=3
    )
    got = solve_fused_streamed(
        params, cost, trajs, dt, EOPTS, interpret=True, chunk=3,
        supertile=True,
    )
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[1]), rtol=1e-10, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(got[0].controls), np.asarray(ref[0].controls), atol=1e-8
    )

    params, cost, trajs, dt = _mixed_problem(1024, n=9, hard_scale=1.2)
    r1 = solve_fddp_streamed(
        params, cost, trajs, dt, _OPTS, interpret=True, chunk=4
    )
    r2 = solve_fddp_streamed(
        params, cost, trajs, dt, _OPTS, interpret=True, chunk=4,
        supertile=True,
    )
    np.testing.assert_array_equal(np.asarray(r1[3]), np.asarray(r2[3]))
    np.testing.assert_array_equal(np.asarray(r1[2]), np.asarray(r2[2]))
    np.testing.assert_allclose(
        np.asarray(r1[1]), np.asarray(r2[1]), rtol=1e-10, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(r1[0].controls), np.asarray(r2[0].controls), atol=1e-8
    )
