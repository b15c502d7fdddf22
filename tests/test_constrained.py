"""Control-limited iLQR (solver/constrained.solve_box).

Contracts: (a) with non-binding bounds the solution is the unconstrained
solve exactly; (b) with binding bounds every control respects the box and
the solution is a KKT point of the true shooting problem (projected
gradient ~ 0 — checked with the exact autodiff gradient of the rollout
objective, not the solver's own quadratic model); (c) composes with vmap;
(d) model-generic.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models import quadrotor as qmod
from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams, State
from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
from quadrotorilqr_tpu.solver.constrained import solve_box
from quadrotorilqr_tpu.solver.diff import _objective
from quadrotorilqr_tpu.solver.ilqr import Trajectory, solve
from quadrotorilqr_tpu.solver.options import (
    ConvergenceCriteria,
    ILQROptions,
)

DT = 0.05
N = 8
DTYPE = jnp.float64

_OPTIONS = ILQROptions(
    convergence_criteria=ConvergenceCriteria(1e-12, 1e-12, 80)
)


def _problem(seed=0):
    rng = np.random.default_rng(seed)
    params = QuadrotorParams.create(
        mass_kg=1.2,
        inertia=jnp.asarray(np.diag([0.4, 0.5, 0.6]) + 0.05, DTYPE),
        arm_length_m=0.25,
        torque_to_thrust_ratio_m=0.02,
        g_mpss=9.81,
    )
    hover = jnp.full((N, 4), 1.2 * 9.81 / 4.0, DTYPE)
    desired = Trajectory(
        times=jnp.arange(N, dtype=DTYPE) * DT,
        states=State(
            pose=se3.identity((N,), DTYPE), vel=jnp.zeros((N, 6), DTYPE)
        ),
        controls=hover,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.asarray(np.diag([80.0] * 6 + [1.5] * 6), DTYPE),
        R=jnp.eye(4, dtype=DTYPE),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    x0 = State(
        pose=se3.exp(jnp.asarray(0.15 * rng.normal(size=(1, 6)), DTYPE)),
        vel=jnp.asarray(0.1 * rng.normal(size=(1, 6)), DTYPE),
    )
    init = jax.tree.map(
        lambda a: a[0], initial_trajectory_from_state(x0, desired)
    )
    return params, cost, init, desired


def _projected_gradient(params, cost, res, lo, hi, model=qmod):
    u = np.asarray(res.trajectory.controls)
    x0 = jax.tree.map(lambda a: a[0], res.trajectory.states)
    g = np.asarray(
        jax.grad(
            lambda uu: _objective(uu, params, cost, x0, DT, model)[0]
        )(res.trajectory.controls)
    )
    at_lo = (u <= lo + 1e-9) & (g > 0)
    at_hi = (u >= hi - 1e-9) & (g < 0)
    return np.where(at_lo | at_hi, 0.0, g)


def test_wide_limits_reduce_to_unconstrained():
    params, cost, init, _ = _problem()
    ref = solve(params, cost, init, DT, _OPTIONS)
    wide = solve_box(params, cost, init, DT, -1e6, 1e6, _OPTIONS)
    assert int(wide.status) == 1
    np.testing.assert_allclose(
        np.asarray(wide.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-8,
    )
    np.testing.assert_allclose(float(wide.cost), float(ref.cost), rtol=1e-12)


def test_binding_limits_give_kkt_point():
    params, cost, init, _ = _problem()
    lo, hi = 0.0, 2.8  # below the unconstrained solution's peak thrust
    res = solve_box(params, cost, init, DT, lo, hi, _OPTIONS)
    assert int(res.status) == 1
    u = np.asarray(res.trajectory.controls)
    assert u.max() <= hi + 1e-12 and u.min() >= lo - 1e-12
    assert (u >= hi - 1e-9).sum() > 0, "bounds must actually bind"

    pg = _projected_gradient(params, cost, res, lo, hi)
    assert np.abs(pg).max() < 1e-5, np.abs(pg).max()

    # constrained optimum costs more than the unconstrained one
    ref = solve(params, cost, init, DT, _OPTIONS)
    assert float(res.cost) > float(ref.cost)


def test_box_solve_vmaps():
    params, cost, init, desired = _problem()
    rng = np.random.default_rng(3)
    x0 = State(
        pose=se3.exp(jnp.asarray(0.15 * rng.normal(size=(4, 6)), DTYPE)),
        vel=jnp.asarray(0.1 * rng.normal(size=(4, 6)), DTYPE),
    )
    init_b = initial_trajectory_from_state(x0, desired)
    res = jax.jit(
        jax.vmap(lambda t: solve_box(params, cost, t, DT, 0.0, 2.8, _OPTIONS))
    )(init_b)
    u = np.asarray(res.trajectory.controls)
    assert u.shape == (4, N, 4)
    assert u.max() <= 2.8 + 1e-12
    assert (np.asarray(res.status) == 1).all()


def test_box_solve_wrench_model():
    from quadrotorilqr_tpu.models import se3_wrench as wm
    from quadrotorilqr_tpu.models.se3_wrench import WrenchParams

    rng = np.random.default_rng(5)
    params = WrenchParams.create(
        mass_kg=1.4,
        inertia=jnp.asarray(np.diag([0.5, 0.6, 0.7]) + 0.04, DTYPE),
        g_mpss=9.81,
    )
    hover = jnp.zeros((N, 6), DTYPE).at[:, 2].set(1.4 * 9.81)
    desired = Trajectory(
        times=jnp.arange(N, dtype=DTYPE) * DT,
        states=State(
            pose=se3.identity((N,), DTYPE), vel=jnp.zeros((N, 6), DTYPE)
        ),
        controls=hover,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.asarray(np.diag([80.0] * 6 + [1.5] * 6), DTYPE),
        R=jnp.eye(6, dtype=DTYPE),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    x0 = State(
        pose=se3.exp(jnp.asarray(0.2 * rng.normal(size=(1, 6)), DTYPE)),
        vel=jnp.asarray(0.1 * rng.normal(size=(1, 6)), DTYPE),
    )
    init = jax.tree.map(
        lambda a: a[0], initial_trajectory_from_state(x0, desired)
    )
    lo = jnp.asarray([-20.0] * 3 + [-1.5] * 3, DTYPE)
    hi = jnp.asarray([20.0] * 3 + [1.5] * 3, DTYPE)
    res = solve_box(params, cost, init, DT, lo, hi, _OPTIONS, model=wm)
    assert int(res.status) == 1
    u = np.asarray(res.trajectory.controls)
    assert (u <= np.asarray(hi) + 1e-12).all()
    assert (u >= np.asarray(lo) - 1e-12).all()
    pg = _projected_gradient(
        params, cost, res, np.asarray(lo), np.asarray(hi), model=wm
    )
    assert np.abs(pg).max() < 1e-5, np.abs(pg).max()


def test_box_on_fused_kernel_path():
    """Control limits on the batch-level kernel engine: lane-for-lane
    parity with the vmapped XLA solve_box (f64 interpret), and
    solve_batch_latency routes limits there automatically."""
    from quadrotorilqr_tpu.solver.batched import (
        solve_batch_fused,
        solve_batch_latency,
    )

    params, cost, init, desired = _problem()
    rng = np.random.default_rng(21)
    b = 128
    x0 = State(
        pose=se3.exp(jnp.asarray(0.15 * rng.normal(size=(b, 6)), DTYPE)),
        vel=jnp.asarray(0.1 * rng.normal(size=(b, 6)), DTYPE),
    )
    init_b = initial_trajectory_from_state(x0, desired)
    lo, hi = 0.0, 2.8

    ref = jax.vmap(
        lambda t: solve_box(params, cost, t, DT, lo, hi, _OPTIONS)
    )(init_b)
    f = solve_batch_fused(
        params, cost, init_b, DT, _OPTIONS, interpret=True, limits=(lo, hi)
    )
    np.testing.assert_allclose(
        np.asarray(f.cost), np.asarray(ref.cost), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(f.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-8,
    )
    assert (np.asarray(f.status) == np.asarray(ref.status)).all()
    u = np.asarray(f.trajectory.controls)
    assert u.max() <= hi + 1e-12 and u.min() >= 0.0 - 1e-12
    assert (u >= hi - 1e-9).sum() > 0, "bounds must actually bind"

    lat = solve_batch_latency(
        params, cost, init_b, DT, _OPTIONS, interpret=True, limits=(lo, hi)
    )
    np.testing.assert_allclose(
        np.asarray(lat.cost), np.asarray(f.cost), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(lat.trajectory.controls),
        np.asarray(f.trajectory.controls),
        atol=1e-10,
    )
    assert (np.asarray(lat.status) == np.asarray(f.status)).all()

    # streamed whole-solve engine with limits (kernels/stream.py use_box)
    from quadrotorilqr_tpu.kernels.stream import solve_fused_streamed

    st, sc, _, ss = solve_fused_streamed(
        params, cost, init_b, DT, _OPTIONS, interpret=True, chunk=5,
        limits=(lo, hi),
    )
    np.testing.assert_allclose(np.asarray(sc), np.asarray(f.cost), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(st.controls),
        np.asarray(f.trajectory.controls),
        atol=1e-10,
    )
    assert (np.asarray(ss) == np.asarray(f.status)).all()


def test_box_per_scenario_limits():
    """Per-scenario bounds ((B, u) lane tiles — Monte-Carlo over actuator
    derating): lane-for-lane parity with per-lane vmapped solve_box on the
    batch loop, whole-solve, and streamed engines."""
    from quadrotorilqr_tpu.kernels.stream import solve_fused_streamed
    from quadrotorilqr_tpu.solver.batched import (
        solve_batch_fused,
        solve_batch_latency,
    )

    params, cost, init, desired = _problem()
    rng = np.random.default_rng(33)
    b = 128
    x0 = State(
        pose=se3.exp(jnp.asarray(0.15 * rng.normal(size=(b, 6)), DTYPE)),
        vel=jnp.asarray(0.1 * rng.normal(size=(b, 6)), DTYPE),
    )
    init_b = initial_trajectory_from_state(x0, desired)
    # per-scenario derated ceilings (and a shared floor broadcast up)
    hi_b = jnp.asarray(rng.uniform(2.5, 3.2, size=(b, 4)), DTYPE)
    lo_b = jnp.zeros((b, 4), DTYPE)

    ref = jax.vmap(
        lambda lo, hi, t: solve_box(params, cost, t, DT, lo, hi, _OPTIONS)
    )(lo_b, hi_b, init_b)
    f = solve_batch_fused(
        params, cost, init_b, DT, _OPTIONS, interpret=True,
        limits=(lo_b, hi_b),
    )
    np.testing.assert_allclose(
        np.asarray(f.cost), np.asarray(ref.cost), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(f.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-8,
    )
    assert (np.asarray(f.status) == np.asarray(ref.status)).all()
    u = np.asarray(f.trajectory.controls)
    assert (u <= np.asarray(hi_b)[:, None, :] + 1e-12).all()
    assert (u >= np.asarray(hi_b)[:, None, :] - 1e-9).any(), "must bind"

    lat = solve_batch_latency(
        params, cost, init_b, DT, _OPTIONS, interpret=True,
        limits=(lo_b, hi_b),
    )
    np.testing.assert_allclose(
        np.asarray(lat.cost), np.asarray(f.cost), rtol=1e-12
    )
    assert (np.asarray(lat.status) == np.asarray(f.status)).all()

    st, sc, _, ss = solve_fused_streamed(
        params, cost, init_b, DT, _OPTIONS, interpret=True, chunk=5,
        limits=(lo_b, hi_b),
    )
    np.testing.assert_allclose(np.asarray(sc), np.asarray(f.cost), rtol=1e-12)
    assert (np.asarray(ss) == np.asarray(f.status)).all()


def test_box_per_scenario_limits_fddp():
    """Per-scenario bounds through the FDDP kernels vs per-lane vmapped
    solve_fddp(limits=...)."""
    from quadrotorilqr_tpu.solver import solve_fddp
    from quadrotorilqr_tpu.solver.batched import solve_batch_fddp
    from quadrotorilqr_tpu.solver.options import (
        ConvergenceCriteria,
        ILQROptions,
        LineSearchParams,
    )

    opts = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 15),
    )
    params, cost, init, desired = _problem()
    rng = np.random.default_rng(34)
    b = 128
    x0 = State(
        pose=se3.exp(jnp.asarray(0.6 * rng.normal(size=(b, 6)), DTYPE)),
        vel=jnp.asarray(0.4 * rng.normal(size=(b, 6)), DTYPE),
    )
    init_b = initial_trajectory_from_state(x0, desired)
    hi_b = jnp.asarray(rng.uniform(2.6, 3.4, size=(b, 4)), DTYPE)
    lo_b = jnp.zeros((b, 4), DTYPE)

    ref = jax.vmap(
        lambda lo, hi, t: solve_fddp(
            params, cost, t, DT, opts, limits=(lo, hi)
        )
    )(lo_b, hi_b, init_b)
    got = solve_batch_fddp(
        params, cost, init_b, DT, opts, interpret=True, limits=(lo_b, hi_b)
    )
    np.testing.assert_allclose(
        np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(got.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-8,
    )
    assert (np.asarray(got.status) == np.asarray(ref.status)).all()
    assert (np.asarray(got.iterations) == np.asarray(ref.iterations)).all()


def test_box_per_scenario_limits_padding():
    """Per-scenario bounds survive the non-multiple-of-128 padding path
    (the bounds pad with the batch; solver/batched._pad_limits)."""
    from quadrotorilqr_tpu.solver.batched import solve_batch_fused

    params, cost, init, desired = _problem()
    rng = np.random.default_rng(35)
    b = 130
    x0 = State(
        pose=se3.exp(jnp.asarray(0.15 * rng.normal(size=(b, 6)), DTYPE)),
        vel=jnp.asarray(0.1 * rng.normal(size=(b, 6)), DTYPE),
    )
    init_b = initial_trajectory_from_state(x0, desired)
    hi_b = jnp.asarray(rng.uniform(2.5, 3.2, size=(b, 4)), DTYPE)
    lo_b = jnp.zeros((b, 4), DTYPE)
    got = solve_batch_fused(
        params, cost, init_b, DT, _OPTIONS, interpret=True,
        limits=(lo_b, hi_b),
    )
    ref = jax.vmap(
        lambda lo, hi, t: solve_box(params, cost, t, DT, lo, hi, _OPTIONS)
    )(lo_b, hi_b, init_b)
    np.testing.assert_allclose(
        np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-9
    )
    assert (np.asarray(got.status) == np.asarray(ref.status)).all()


def test_box_limits_through_compacted_refine():
    """Control limits through the on-device compacted two-phase solver
    (solve_batch_refine passes limits into both phases): lane-for-lane
    equal to the single-phase box solve."""
    from quadrotorilqr_tpu.solver.batched import (
        solve_batch_fused,
        solve_batch_refine,
    )
    from quadrotorilqr_tpu.solver.options import ConvergenceCriteria

    params, cost, init, desired = _problem()
    rng = np.random.default_rng(36)
    b = 128
    x0 = State(
        pose=se3.exp(jnp.asarray(0.15 * rng.normal(size=(b, 6)), DTYPE)),
        vel=jnp.asarray(0.1 * rng.normal(size=(b, 6)), DTYPE),
    )
    init_b = initial_trajectory_from_state(x0, desired)
    lim = (0.0, 2.8)
    opts = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, 12)
    )
    one = solve_batch_fused(
        params, cost, init_b, DT, opts, interpret=True, limits=lim
    )
    two = solve_batch_refine(
        params, cost, init_b, DT, opts, phase1_iters=4, interpret=True,
        limits=lim,
    )
    np.testing.assert_allclose(
        np.asarray(two.cost), np.asarray(one.cost), rtol=1e-12
    )
    assert (np.asarray(two.status) == np.asarray(one.status)).all()
    assert (np.asarray(two.iterations) == np.asarray(one.iterations)).all()
    u = np.asarray(two.trajectory.controls)
    assert u.max() <= 2.8 + 1e-12 and u.min() >= -1e-12
