"""Cross-device straggler rebalance (solve_sharded_fddp(refine=...)) and
the per-phase hybrid curvature schedule (ddp as a tuple) — VERDICT r3
items #3/#4.

The rebalance contract: at each compaction boundary the GLOBAL pending
mask orders a stable permutation, lane operands gather through it across
the mesh (a GSPMD collective), and the next phase resumes exactly from
the kernels' mu/status/iters rows. Lane-for-lane it must equal the
single-device solver/batched.solve_batch_fddp_refine — statuses and
iteration counts EXACTLY, values at cross-program tolerance (XLA fuses
FMA differently per program; same-program runs are bit-deterministic,
cross-program bit equality is not a property interpret mode has)."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadrotorilqr_tpu.costs import QuadraticTrackingCost
from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models import quadrotor as qm
from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
from quadrotorilqr_tpu.parallel.mesh import (
    make_scenario_mesh,
    solve_sharded_fddp,
)
from quadrotorilqr_tpu.solver import ILQROptions, Trajectory
from quadrotorilqr_tpu.solver.batched import (
    solve_batch_fddp,
    solve_batch_fddp_refine,
)
from quadrotorilqr_tpu.solver.ilqr import STATUS_CONVERGED, STATUS_MAX_ITERS
from quadrotorilqr_tpu.solver.options import ConvergenceCriteria

F64 = jnp.float64


def _problem(batch=256, n=8, dt=0.05, seed=0, scale=1.0):
    """Mixed benign/aggressive population: a wide iteration spread, so the
    compaction boundary leaves real stragglers on BOTH halves of the
    batch (the cross-shard permute must actually move lanes)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x0 = qm.State(
        pose=se3.exp(scale * jax.random.normal(k1, (batch, 6), F64)),
        vel=scale * jax.random.normal(k2, (batch, 6), F64),
    )
    params = qm.QuadrotorParams.create(
        mass_kg=1.0,
        inertia=jnp.asarray(np.diag([0.01, 0.012, 0.014]), F64),
        arm_length_m=0.2,
        torque_to_thrust_ratio_m=0.015,
        g_mpss=9.81,
    )
    hover = jnp.full((n, 4), 9.81 / 4.0, F64)
    desired = Trajectory(
        times=dt * jnp.arange(n, dtype=F64),
        states=qm.State(
            pose=se3.identity((n,), F64), vel=jnp.zeros((n, 6), F64)
        ),
        controls=hover,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.diag(jnp.asarray([50.0] * 6 + [1.0] * 6, F64)),
        R=0.1 * jnp.eye(4, dtype=F64),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    return params, cost, initial_trajectory_from_state(x0, desired), dt


_OPTS = ILQROptions(
    convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 10)
)


def _assert_refine_parity(got, ref):
    np.testing.assert_array_equal(
        np.asarray(got.status), np.asarray(ref.status)
    )
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(got.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-7,
    )


def test_sharded_refine_matches_unsharded():
    """2-device mesh, one compaction boundary: lane parity with the
    single-device refine, and the boundary genuinely crosses shards."""
    params, cost, trajs, dt = _problem()
    ref = solve_batch_fddp_refine(
        params, cost, trajs, dt, _OPTS, phase1_iters=3, interpret=True
    )
    mesh = make_scenario_mesh(jax.devices()[:2])
    got, stats = solve_sharded_fddp(
        params, cost, trajs, dt, _OPTS, mesh, interpret=True, refine=3
    )
    _assert_refine_parity(got, ref)
    conv = np.asarray(ref.status) == STATUS_CONVERGED
    assert float(stats["n_converged"]) == conv.sum()
    np.testing.assert_allclose(
        float(stats["total_cost"]), float(np.asarray(ref.cost).sum()),
        rtol=1e-9,
    )
    # the boundary must leave pending lanes in BOTH shards' halves, so the
    # compaction permute crossed the device boundary
    mid = solve_batch_fddp(
        params, cost, trajs, dt,
        ILQROptions(convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 3)),
        interpret=True,
    )
    pend = np.asarray(mid.status) == STATUS_MAX_ITERS
    half = pend.size // 2
    assert pend[:half].sum() > 0 and pend[half:].sum() > 0


def test_sharded_refine_multi_boundary_8dev():
    """Two compaction boundaries over the full 8-device mesh (each shard
    one 128-lane tile after padding is NOT available here — the global
    batch must tile exactly), against the unsharded multi-boundary
    refine."""
    params, cost, trajs, dt = _problem(batch=1024, seed=3)
    opts = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 8)
    )
    ref = solve_batch_fddp_refine(
        params, cost, trajs, dt, opts, phase1_iters=(2, 5), interpret=True
    )
    mesh = make_scenario_mesh()
    got, _ = solve_sharded_fddp(
        params, cost, trajs, dt, opts, mesh, interpret=True, refine=(2, 5)
    )
    _assert_refine_parity(got, ref)


def test_sharded_refine_per_scenario_operands():
    """Per-scenario params and cost leaves gather through the SAME global
    permutation as the trajectories (wrong gather = wrong dynamics for
    every rebalanced lane — loud, not subtle)."""
    params, cost, trajs, dt = _problem()
    batch = trajs.controls.shape[0]
    rng = np.random.default_rng(7)
    params_b = qm.QuadrotorParams(
        mass_kg=jnp.asarray(rng.uniform(0.8, 1.6, size=(batch,)), F64),
        inertia=jnp.broadcast_to(params.inertia, (batch, 3, 3)),
        arm_length_m=jnp.broadcast_to(params.arm_length_m, (batch,)),
        torque_to_thrust_ratio_m=jnp.broadcast_to(
            params.torque_to_thrust_ratio_m, (batch,)
        ),
        g_mpss=jnp.broadcast_to(params.g_mpss, (batch,)),
    )
    scale = jnp.asarray(rng.uniform(0.5, 2.0, size=(batch,)), F64)
    cost_b = QuadraticTrackingCost(
        Q=scale[:, None, None] * cost.Q,
        R=cost.R,  # mixed: Q per-scenario, R/desired shared
        desired_states=cost.desired_states,
        desired_controls=cost.desired_controls,
    )
    ref = solve_batch_fddp_refine(
        params_b, cost_b, trajs, dt, _OPTS, phase1_iters=3, interpret=True
    )
    mesh = make_scenario_mesh(jax.devices()[:2])
    got, _ = solve_sharded_fddp(
        params_b, cost_b, trajs, dt, _OPTS, mesh, interpret=True, refine=3
    )
    _assert_refine_parity(got, ref)
    assert np.unique(np.asarray(got.cost)).size > batch // 2


def test_sharded_refine_refusals():
    params, cost, trajs, dt = _problem(batch=256)
    mesh = make_scenario_mesh(jax.devices()[:2])
    with pytest.raises(ValueError, match="multiple of the 128-lane"):
        solve_sharded_fddp(
            params, cost,
            jax.tree.map(lambda a: a[:192], trajs),
            dt, _OPTS, mesh, interpret=True, refine=3,
        )
    lim = (jnp.zeros((256, 4), F64), jnp.full((256, 4), 9.0, F64))
    with pytest.raises(ValueError, match="per-scenario limits"):
        solve_sharded_fddp(
            params, cost, trajs, dt, _OPTS, mesh, interpret=True,
            refine=3, limits=lim,
        )
    with pytest.raises(ValueError, match="refine="):
        solve_sharded_fddp(
            params, cost, trajs, dt, _OPTS, mesh, interpret=True,
            ddp=(False, True),
        )


# ---------------------------------------------------------------- hybrid


def test_hybrid_uniform_tuple_collapses():
    """ddp=(True, True) IS ddp=True (the tuple collapses to its bool
    before tracing, so the programs — and therefore the bits — are
    identical)."""
    params, cost, trajs, dt = _problem(batch=128, scale=0.8)
    a = solve_batch_fddp_refine(
        params, cost, trajs, dt, _OPTS, phase1_iters=3, interpret=True,
        ddp=(True, True),
    )
    b = solve_batch_fddp_refine(
        params, cost, trajs, dt, _OPTS, phase1_iters=3, interpret=True,
        ddp=True,
    )
    np.testing.assert_array_equal(np.asarray(a.cost), np.asarray(b.cost))
    np.testing.assert_array_equal(
        np.asarray(a.status), np.asarray(b.status)
    )
    np.testing.assert_array_equal(
        np.asarray(a.trajectory.controls), np.asarray(b.trajectory.controls)
    )


def test_hybrid_frozen_lanes_untouched():
    """Lanes that converge BEFORE the curvature flip are frozen by the
    resume rows: the phase-2 engine (whatever its curvature) must pass
    them through bit-exactly, so hybrid and pure-GN refine agree on them
    bit-for-bit."""
    params, cost, trajs, dt = _problem()
    gn = solve_batch_fddp_refine(
        params, cost, trajs, dt, _OPTS, phase1_iters=7, interpret=True
    )
    hyb = solve_batch_fddp_refine(
        params, cost, trajs, dt, _OPTS, phase1_iters=7, interpret=True,
        ddp=(False, True),
    )
    mid = solve_batch_fddp(
        params, cost, trajs, dt,
        ILQROptions(convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 7)),
        interpret=True,
    )
    early = np.asarray(mid.status) == STATUS_CONVERGED
    assert early.sum() > 32
    np.testing.assert_array_equal(
        np.asarray(gn.cost)[early], np.asarray(hyb.cost)[early]
    )
    np.testing.assert_array_equal(
        np.asarray(gn.trajectory.controls)[early],
        np.asarray(hyb.trajectory.controls)[early],
    )
    np.testing.assert_array_equal(
        np.asarray(gn.iterations)[early], np.asarray(hyb.iterations)[early]
    )


def test_hybrid_curvature_rescues_stragglers():
    """The schedule's point: exact curvature on the compacted straggler
    phase converges lanes Gauss-Newton leaves pending at the same total
    budget (the measured f64 iteration win of benchmarks/solvers_bench.py
    applied only where it pays)."""
    params, cost, trajs, dt = _problem()
    gn = solve_batch_fddp_refine(
        params, cost, trajs, dt, _OPTS, phase1_iters=3, interpret=True
    )
    hyb = solve_batch_fddp_refine(
        params, cost, trajs, dt, _OPTS, phase1_iters=3, interpret=True,
        ddp=(False, True),
    )
    n_gn = int((np.asarray(gn.status) == STATUS_CONVERGED).sum())
    n_hyb = int((np.asarray(hyb.status) == STATUS_CONVERGED).sum())
    assert n_hyb > n_gn
    # and the sharded hybrid matches the unsharded hybrid lane-for-lane
    mesh = make_scenario_mesh(jax.devices()[:2])
    got, _ = solve_sharded_fddp(
        params, cost, trajs, dt, _OPTS, mesh, interpret=True, refine=3,
        ddp=(False, True),
    )
    _assert_refine_parity(got, hyb)


def test_hybrid_refusals():
    params, cost, trajs, dt = _problem(batch=128)

    with pytest.raises(ValueError, match="one flag per phase"):
        solve_batch_fddp_refine(
            params, cost, trajs, dt, _OPTS, phase1_iters=3,
            interpret=True, ddp=(False, True, False),
        )
    with pytest.raises(ValueError, match="at least two phases"):
        solve_batch_fddp_refine(
            params, cost, trajs, dt, _OPTS, phase1_iters=999,
            interpret=True, ddp=(False, True),
        )
    # substepped + hybrid composes since round 5 (chained exact
    # curvature) — covered by test_integrators.py's ddp+substeps suite
