"""Supertile layout ((r, c, 8, 128): 1024 scenarios per grid step, 8 in
the sublane dim) of the whole-solve kernel — the dense-register throughput
variant motivated by benchmarks/layout_probe.py (1.22x on the Riccati
stage mix, ~100x faster Mosaic compiles).

The kernel BODY is the same code as the minor-lane layout — the lane
algebra (kernels/lanes.py) and the shared stage math are trailing-shape
agnostic — so parity here certifies the layout transform (solve.py
_to_super/_from_super + the supertile BlockSpecs), not re-derived math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadrotorilqr_tpu.costs import QuadraticTrackingCost
from quadrotorilqr_tpu.kernels.solve import _from_super, _to_super
from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models import quadrotor as qm
from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
from quadrotorilqr_tpu.solver import ILQROptions, Trajectory
from quadrotorilqr_tpu.solver.batched import solve_batch_latency
from quadrotorilqr_tpu.solver.options import ConvergenceCriteria

F64 = jnp.float64


def _problem(batch, n=5, dt=0.05, seed=0, per_scenario=False):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x0 = qm.State(
        pose=se3.exp(0.4 * jax.random.normal(k1, (batch, 6), F64)),
        vel=0.4 * jax.random.normal(k2, (batch, 6), F64),
    )
    params = qm.QuadrotorParams.create(
        1.0, jnp.asarray(np.diag([0.01, 0.012, 0.014]), F64), 0.2, 0.015,
        9.81,
    )
    hover = jnp.full((n, 4), 9.81 / 4.0, F64)
    desired = Trajectory(
        times=dt * jnp.arange(n, dtype=F64),
        states=qm.State(
            pose=se3.identity((n,), F64), vel=jnp.zeros((n, 6), F64)
        ),
        controls=hover,
    )
    q = jnp.diag(jnp.asarray([50.0] * 6 + [1.0] * 6, F64))
    if per_scenario:
        rng = np.random.default_rng(5)
        scale = jnp.asarray(rng.uniform(0.5, 2.0, size=(batch,)), F64)
        q = scale[:, None, None] * q
        params = qm.QuadrotorParams(
            mass_kg=jnp.asarray(
                rng.uniform(0.8, 1.4, size=(batch,)), F64
            ),
            inertia=jnp.broadcast_to(params.inertia, (batch, 3, 3)),
            arm_length_m=jnp.broadcast_to(params.arm_length_m, (batch,)),
            torque_to_thrust_ratio_m=jnp.broadcast_to(
                params.torque_to_thrust_ratio_m, (batch,)
            ),
            g_mpss=jnp.broadcast_to(params.g_mpss, (batch,)),
        )
    cost = QuadraticTrackingCost(
        Q=q,
        R=0.1 * jnp.eye(4, dtype=F64),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    return params, cost, initial_trajectory_from_state(x0, desired), dt


_OPTS = ILQROptions(convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 5))


def test_super_roundtrip():
    a = jnp.arange(3 * 7 * 2048.0).reshape(3, 7, 2048)
    np.testing.assert_array_equal(
        np.asarray(_from_super(_to_super(a), 2048)), np.asarray(a)
    )
    # supertile s holds scenarios [1024 s, 1024 (s+1)), sublane-major
    sup = _to_super(a)
    np.testing.assert_array_equal(
        np.asarray(sup[..., :, 0:128]).reshape(3, 7, 1024),
        np.asarray(a[..., 0:1024]),
    )


def _assert_parity(got, ref):
    np.testing.assert_array_equal(
        np.asarray(got.status), np.asarray(ref.status)
    )
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(got.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-10,
    )


def test_supertile_matches_lane_layout():
    """Multi-supertile batch (2048 = 2 grid steps), shared operands."""
    params, cost, trajs, dt = _problem(2048)
    ref = solve_batch_latency(params, cost, trajs, dt, _OPTS, interpret=True)
    got = solve_batch_latency(
        params, cost, trajs, dt, _OPTS, interpret=True, supertile=True
    )
    _assert_parity(got, ref)
    assert int((np.asarray(ref.status) == 1).sum()) > 1024


def test_supertile_per_scenario_operands():
    """Per-scenario params + cost leaves ride the same sublane packing."""
    params, cost, trajs, dt = _problem(1024, per_scenario=True)
    ref = solve_batch_latency(params, cost, trajs, dt, _OPTS, interpret=True)
    got = solve_batch_latency(
        params, cost, trajs, dt, _OPTS, interpret=True, supertile=True
    )
    _assert_parity(got, ref)
    assert np.unique(np.asarray(got.cost)).size > 512


def test_supertile_pads_partial_batches():
    params, cost, trajs, dt = _problem(1500)
    ref = solve_batch_latency(params, cost, trajs, dt, _OPTS, interpret=True)
    got = solve_batch_latency(
        params, cost, trajs, dt, _OPTS, interpret=True, supertile=True
    )
    _assert_parity(got, ref)


def test_supertile_box_limits_and_weights():
    params, cost, trajs, dt = _problem(1024)
    from dataclasses import replace

    cost = replace(
        cost,
        stage_weights=jnp.asarray(
            [1.0, 1.0, 1.0, 1.0, 4.0], F64
        ),
    )
    lim = (0.0, 4.0)
    ref = solve_batch_latency(
        params, cost, trajs, dt, _OPTS, interpret=True, limits=lim
    )
    got = solve_batch_latency(
        params, cost, trajs, dt, _OPTS, interpret=True, limits=lim,
        supertile=True,
    )
    _assert_parity(got, ref)
    u = np.asarray(got.trajectory.controls)
    assert u.max() <= 4.0 + 1e-12 and u.min() >= -1e-12


def test_supertile_cost_history():
    """populate_debug rides the supertile layout too (the history buffer
    is just another lane row set)."""
    from dataclasses import replace

    params, cost, trajs, dt = _problem(1024)
    opts = replace(_OPTS, populate_debug=True)
    ref = solve_batch_latency(params, cost, trajs, dt, opts, interpret=True)
    got = solve_batch_latency(
        params, cost, trajs, dt, opts, interpret=True, supertile=True
    )
    _assert_parity(got, ref)
    np.testing.assert_array_equal(
        np.asarray(got.debug.costs), np.asarray(ref.debug.costs)
    )
    np.testing.assert_array_equal(
        np.asarray(got.debug.valid), np.asarray(ref.debug.valid)
    )


def test_batch_loop_supertile_matches_lane_layout():
    """The PER-PASS kernels (backward + rollout — the batch-loop engine and
    the constrained path's workhorses) ride the supertile layout too
    (round 5: every kernel family, VERDICT r4 #7/#8)."""
    from quadrotorilqr_tpu.solver.batched import solve_batch_fused

    params, cost, trajs, dt = _problem(2048)
    ref = solve_batch_fused(params, cost, trajs, dt, _OPTS, interpret=True)
    got = solve_batch_fused(
        params, cost, trajs, dt, _OPTS, interpret=True, supertile=True
    )
    _assert_parity(got, ref)


def test_auglag_supertile_matches_lane_layout():
    """Constrained flight (PHR augmented Lagrangian, streamed penalty
    operands incl. C_xu) in the supertile layout — VERDICT r4 #7."""
    from quadrotorilqr_tpu.solver import constraints as C
    from quadrotorilqr_tpu.solver.auglag import ALOptions, solve_auglag_batch

    params, cost, trajs, dt = _problem(1024)
    sphere = C.sphere_keepout(center=[0.3, 0.0, 0.0], radius=0.15)
    alo = ALOptions(max_outer_iters=2)
    ref = solve_auglag_batch(
        params, cost, sphere, trajs, dt, _OPTS, alo, interpret=True
    )
    got = solve_auglag_batch(
        params, cost, sphere, trajs, dt, _OPTS, alo, interpret=True,
        supertile=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got.status), np.asarray(ref.status)
    )
    np.testing.assert_allclose(
        np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-10, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(got.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(got.max_violation), np.asarray(ref.max_violation),
        atol=1e-9,
    )


def _wrench_problem(batch, n=5, dt=0.05):
    from quadrotorilqr_tpu.models.se3_wrench import WrenchParams

    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x0 = qm.State(
        pose=se3.exp(0.3 * jax.random.normal(k1, (batch, 6), F64)),
        vel=0.3 * jax.random.normal(k2, (batch, 6), F64),
    )
    params = WrenchParams.create(
        mass_kg=1.3,
        inertia=jnp.asarray(np.diag([0.4, 0.5, 0.6]) + 0.03, F64),
        g_mpss=9.81,
    )
    hover = jnp.zeros((n, 6), F64).at[:, 2].set(1.3 * 9.81)
    desired = Trajectory(
        times=dt * jnp.arange(n, dtype=F64),
        states=qm.State(
            pose=se3.identity((n,), F64), vel=jnp.zeros((n, 6), F64)
        ),
        controls=hover,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.diag(jnp.asarray([50.0] * 6 + [1.0] * 6, F64)),
        R=0.1 * jnp.eye(6, dtype=F64),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    return params, cost, initial_trajectory_from_state(x0, desired), dt


def test_wrench_supertile_matches_lane_layout():
    """Second model family (SE(3) body wrench, u=6) through the supertile:
    the layout is a LaneModel-generic transform, never a fork (VERDICT r4
    #8)."""
    from quadrotorilqr_tpu.models import se3_wrench as wm

    params, cost, trajs, dt = _wrench_problem(1024)
    ref = solve_batch_latency(
        params, cost, trajs, dt, _OPTS, interpret=True, model=wm
    )
    got = solve_batch_latency(
        params, cost, trajs, dt, _OPTS, interpret=True, model=wm,
        supertile=True,
    )
    _assert_parity(got, ref)


def test_hexarotor_supertile_matches_lane_layout():
    """Generic multirotor (hexarotor, u=6) through the supertile."""
    from quadrotorilqr_tpu.models import multirotor as mm
    from quadrotorilqr_tpu.models.multirotor import MultirotorParams

    n, dt = 5, 0.05
    hexa = MultirotorParams.regular(
        6, mass_kg=1.5,
        inertia=jnp.asarray(np.diag([0.4, 0.5, 0.6]) + 0.03, F64),
        arm_length_m=0.3, torque_to_thrust_ratio_m=0.02, g_mpss=9.81,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    batch = 1024
    x0 = qm.State(
        pose=se3.exp(0.3 * jax.random.normal(k1, (batch, 6), F64)),
        vel=0.3 * jax.random.normal(k2, (batch, 6), F64),
    )
    hover = jnp.full((n, 6), 1.5 * 9.81 / 6.0, F64)
    desired = Trajectory(
        times=dt * jnp.arange(n, dtype=F64),
        states=qm.State(
            pose=se3.identity((n,), F64), vel=jnp.zeros((n, 6), F64)
        ),
        controls=hover,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.diag(jnp.asarray([50.0] * 6 + [1.0] * 6, F64)),
        R=0.1 * jnp.eye(6, dtype=F64),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    trajs = initial_trajectory_from_state(x0, desired)
    ref = solve_batch_latency(
        hexa, cost, trajs, dt, _OPTS, interpret=True, model=mm
    )
    got = solve_batch_latency(
        hexa, cost, trajs, dt, _OPTS, interpret=True, model=mm,
        supertile=True,
    )
    _assert_parity(got, ref)
