"""Model-generic fused kernels: the SE(3) wrench family on every engine.

The kernel engines (batch loop, whole-solve, streamed) take a LaneModel
descriptor (kernels/models.py) — the kernel-level counterpart of the
solver layer's `model=` genericity (the reference's `template <class
ModelT>`, ilqr.hh:25). Contract: lane-for-lane parity in f64 interpret
mode against the vmapped XLA solver running the same model module, for
shared AND per-scenario physical params.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models import se3_wrench as wm
from quadrotorilqr_tpu.models.quadrotor import State
from quadrotorilqr_tpu.models.se3_wrench import WrenchParams
from quadrotorilqr_tpu.parallel.batch import (
    initial_trajectory_from_state,
    solve_batch,
)
from quadrotorilqr_tpu.solver.batched import (
    solve_batch_fused,
    solve_batch_latency,
)
from quadrotorilqr_tpu.solver.ilqr import Trajectory
from quadrotorilqr_tpu.solver.options import (
    ConvergenceCriteria,
    ILQROptions,
)

DT = 0.03
N = 10
B = 128
DTYPE = jnp.float64


def _desired(params_mass_g=1.4 * 9.81):
    hover = jnp.zeros((N, 6), DTYPE).at[:, 2].set(params_mass_g)
    return Trajectory(
        times=jnp.arange(N, dtype=DTYPE) * DT,
        states=State(
            pose=se3.identity((N,), DTYPE), vel=jnp.zeros((N, 6), DTYPE)
        ),
        controls=hover,
    )


def _cost(desired):
    return QuadraticTrackingCost(
        Q=jnp.asarray(np.diag([100.0] * 6 + [1.0] * 6), DTYPE),
        R=jnp.eye(6, dtype=DTYPE),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )


def _inits(seed, desired):
    rng = np.random.default_rng(seed)
    x0 = State(
        pose=se3.exp(jnp.asarray(0.25 * rng.normal(size=(B, 6)), DTYPE)),
        vel=jnp.asarray(0.2 * rng.normal(size=(B, 6)), DTYPE),
    )
    return initial_trajectory_from_state(x0, desired)


_OPTIONS = ILQROptions(
    convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 10)
)


def _assert_same(a, b, atol=1e-8):
    np.testing.assert_allclose(np.asarray(a.cost), np.asarray(b.cost), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(a.trajectory.controls),
        np.asarray(b.trajectory.controls),
        atol=atol,
    )
    assert (np.asarray(a.status) == np.asarray(b.status)).all()
    assert (np.asarray(a.iterations) == np.asarray(b.iterations)).all()


def test_wrench_shared_params_all_engines():
    """Shared params: batch loop, whole-solve, and streamed kernels match
    the vmapped XLA solver lane for lane (f64 interpret)."""
    from quadrotorilqr_tpu.kernels.stream import solve_fused_streamed

    params = WrenchParams.create(
        mass_kg=1.4,
        inertia=jnp.asarray(np.diag([0.5, 0.6, 0.7]) + 0.04, DTYPE),
        g_mpss=9.81,
    )
    desired = _desired(1.4 * 9.81)
    init = _inits(7, desired)
    cost = _cost(desired)

    ref = solve_batch(params, cost, init, DT, _OPTIONS, model=wm)
    f = solve_batch_fused(
        params, cost, init, DT, _OPTIONS, interpret=True, model=wm
    )
    _assert_same(f, ref)
    assert (np.asarray(f.status) == 1).all()

    w = solve_batch_latency(
        params, cost, init, DT, _OPTIONS, interpret=True, model=wm
    )
    _assert_same(w, f, atol=1e-10)

    # streamed engine with a chunk that forces a ragged tail (N=10, chunk=4)
    s_traj, s_cost, s_iters, s_status = solve_fused_streamed(
        params, cost, init, DT, _OPTIONS, interpret=True, chunk=4, model=wm
    )
    np.testing.assert_allclose(
        np.asarray(s_cost), np.asarray(f.cost), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s_traj.controls),
        np.asarray(f.trajectory.controls),
        atol=1e-10,
    )
    assert (np.asarray(s_status) == np.asarray(f.status)).all()


def test_wrench_per_scenario_params():
    """Monte-Carlo wrench params (every leaf carries the leading B) on the
    fused engines vs the vmapped XLA path."""
    rng = np.random.default_rng(11)
    mass = jnp.asarray(1.0 + 0.5 * rng.random(B), DTYPE)
    inert = jnp.asarray(
        np.stack(
            [np.diag(0.4 + 0.3 * rng.random(3)) + 0.03 for _ in range(B)]
        ),
        DTYPE,
    )
    g = jnp.asarray(9.5 + rng.random(B), DTYPE)
    params = WrenchParams(mass_kg=mass, inertia=inert, g_mpss=g)
    desired = _desired(1.3 * 9.81)
    init = _inits(13, desired)
    cost = _cost(desired)

    ref = solve_batch(
        params, cost, init, DT, _OPTIONS, params_batched=True, model=wm
    )
    f = solve_batch_fused(
        params, cost, init, DT, _OPTIONS, interpret=True, model=wm
    )
    _assert_same(f, ref)

    w = solve_batch_latency(
        params, cost, init, DT, _OPTIONS, interpret=True, model=wm
    )
    _assert_same(w, f, atol=1e-10)


def test_wrench_debug_and_refine_paths():
    """populate_debug routes through the batch loop with the wrench model;
    the compacted two-phase solve matches single-phase."""
    from dataclasses import replace

    from quadrotorilqr_tpu.solver.batched import solve_batch_refine

    params = WrenchParams.create(
        mass_kg=1.2,
        inertia=jnp.asarray(np.diag([0.3, 0.4, 0.5]) + 0.02, DTYPE),
        g_mpss=9.81,
    )
    desired = _desired(1.2 * 9.81)
    init = _inits(17, desired)
    cost = _cost(desired)

    single = solve_batch_fused(
        params, cost, init, DT, _OPTIONS, interpret=True, model=wm
    )
    two = solve_batch_refine(
        params, cost, init, DT, _OPTIONS, phase1_iters=2,
        interpret=True, model=wm,
    )
    _assert_same(two, single, atol=1e-10)

    dbg_opts = replace(_OPTIONS, populate_debug=True)
    # since round 3 the latency engine serves debug WITHOUT the batch-loop
    # downgrade: a CostHistory record straight from the kernel's VMEM
    # history buffer (full trajectory snapshots live on solve_batch_fused)
    from quadrotorilqr_tpu.solver import CostHistory

    res = solve_batch_latency(
        params, cost, init, DT, dbg_opts, interpret=True, model=wm
    )
    assert isinstance(res.debug, CostHistory)
    # one debug slot per executed update
    valid_counts = np.asarray(res.debug.valid).sum(axis=1)
    np.testing.assert_array_equal(valid_counts, np.asarray(res.iterations))
    full = solve_batch_fused(
        params, cost, init, DT, dbg_opts, interpret=True, model=wm
    )
    assert full.debug.trajectories.controls.shape[-1] == 6
    np.testing.assert_allclose(
        np.asarray(res.debug.costs), np.asarray(full.debug.costs), atol=1e-9
    )
