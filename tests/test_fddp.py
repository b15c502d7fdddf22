"""Infeasible-start FDDP solver (solver/fddp.py).

The hard workload is calibrated so the EXACT reference loop (`solve`,
ilqr.hh:58-84 semantics) measurably fails: aggressive random attitude +
tumble rates + coarse dt make the unconditional iteration-0 rollout
diverge to NaN, after which every line search fails
(STATUS_LINE_SEARCH_FAILED — the reference throws here, ilqr.hh:191-193).
`solve_fddp` must rescue those scenarios, agree with `solve` where both
converge, and degenerate to a standard iLQR iteration on feasible starts.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost, trajectory_cost
from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models import quadrotor as qm
from quadrotorilqr_tpu.models import se3_wrench as wm
from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
from quadrotorilqr_tpu.solver import (
    STATUS_CONVERGED,
    STATUS_LINE_SEARCH_FAILED,
    ILQROptions,
    Trajectory,
    solve,
    solve_fddp,
)
from quadrotorilqr_tpu.solver.fddp import defects
from quadrotorilqr_tpu.solver.options import ConvergenceCriteria, LineSearchParams

F64 = jnp.float64

_OPTS = ILQROptions(
    line_search_params=LineSearchParams(0.5, 0.5, 40),
    convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 100),
)


def _params():
    # small anisotropic inertia: the gyroscopic omega^2 blowup regime
    return qm.QuadrotorParams.create(
        1.0, jnp.asarray(np.diag([0.01, 0.012, 0.02]), F64), 0.17, 0.016, 9.81
    )


def _problem(x0, dt, n, r_weight):
    hover = jnp.full((n, 4), 9.81 / 4.0, F64)
    desired = Trajectory(
        times=dt * jnp.arange(n, dtype=F64),
        states=qm.State(pose=se3.identity((n,), F64), vel=jnp.zeros((n, 6), F64)),
        controls=hover,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.diag(jnp.asarray([100.0] * 6 + [1.0] * 6, F64)),
        R=r_weight * jnp.eye(4, dtype=F64),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    return cost, initial_trajectory_from_state(x0, desired)


def _hard():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x0 = qm.State(
        pose=se3.exp(2.0 * jax.random.normal(k1, (6,), F64)),
        vel=2.0 * jax.random.normal(k2, (6,), F64),
    )
    cost, traj0 = _problem(x0, 0.15, 30, 1e-3)
    return _params(), cost, traj0, 0.15


def _benign():
    key = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(key)
    x0 = qm.State(
        pose=se3.exp(0.4 * jax.random.normal(k1, (6,), F64)),
        vel=0.2 * jax.random.normal(k2, (6,), F64),
    )
    cost, traj0 = _problem(x0, 0.05, 30, 1.0)
    return _params(), cost, traj0, 0.05


def test_rescues_divergent_initial_rollout():
    params, cost, traj0, dt = _hard()
    plain = solve(params, cost, traj0, dt, _OPTS)
    assert int(plain.status) == STATUS_LINE_SEARCH_FAILED  # the premise
    assert not np.isfinite(float(plain.cost))

    res = solve_fddp(params, cost, traj0, dt, _OPTS)
    assert int(res.status) == STATUS_CONVERGED
    c = float(res.cost)
    assert np.isfinite(c)
    # converged result is dynamically feasible
    gap = float(jnp.abs(defects(params, res.trajectory, dt)).max())
    assert gap < 1e-8, gap
    # and the cost is the honest rollout cost
    np.testing.assert_allclose(
        c, float(trajectory_cost(cost, res.trajectory.states, res.trajectory.controls)),
        rtol=1e-12,
    )


def test_matches_plain_solve_on_benign_problem():
    """Where the reference loop works, FDDP lands on the same optimum (the
    line-search rules differ, so costs agree to solver tolerance, not
    bitwise)."""
    params, cost, traj0, dt = _benign()
    a = solve(params, cost, traj0, dt, _OPTS)
    b = solve_fddp(params, cost, traj0, dt, _OPTS)
    assert int(a.status) == STATUS_CONVERGED
    assert int(b.status) == STATUS_CONVERGED
    np.testing.assert_allclose(float(b.cost), float(a.cost), rtol=1e-6)
    du = np.abs(np.asarray(b.trajectory.controls - a.trajectory.controls))
    assert du.max() < 1e-3, du.max()


def test_feasible_start_zero_gaps():
    """From a dynamically feasible initial trajectory the gaps are zero and
    stay zero through the whole solve."""
    params, cost, traj0, dt = _benign()
    # make it feasible: roll out the initial controls open-loop
    from quadrotorilqr_tpu.solver.ilqr import forward_sim

    n = traj0.controls.shape[-2]
    zero_k = jnp.zeros((n, 4), F64)
    zero_bk = jnp.zeros((n, 4, 12), F64)
    feas = forward_sim(params, traj0, zero_k, zero_bk, jnp.asarray(1.0, F64), dt)
    assert float(jnp.abs(defects(params, feas, dt)).max()) < 1e-12

    res = solve_fddp(params, cost, feas, dt, _OPTS)
    assert int(res.status) == STATUS_CONVERGED
    gap = float(jnp.abs(defects(params, res.trajectory, dt)).max())
    assert gap < 1e-10
    ref = solve(params, cost, feas, dt, _OPTS)
    np.testing.assert_allclose(float(res.cost), float(ref.cost), rtol=1e-6)


def test_vmap_mixed_batch():
    """A batch mixing benign and divergent scenarios: FDDP converges every
    lane; the reference loop demonstrably loses some."""
    n, dt = 30, 0.15
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    b = 16
    x0 = qm.State(
        pose=se3.exp(
            jnp.concatenate(
                [
                    0.3 * jax.random.normal(k1, (b // 2, 6), F64),
                    2.0 * jax.random.normal(k2, (b // 2, 6), F64),
                ]
            )
        ),
        vel=jnp.zeros((b, 6), F64),
    )
    params = _params()
    cost, init = _problem(x0, dt, n, 1e-3)
    plain = jax.vmap(lambda t: solve(params, cost, t, dt, _OPTS))(init)
    robust = jax.vmap(lambda t: solve_fddp(params, cost, t, dt, _OPTS))(init)
    plain_status = np.asarray(plain.status)
    robust_status = np.asarray(robust.status)
    assert (plain_status == STATUS_LINE_SEARCH_FAILED).any()  # the premise
    assert (robust_status == STATUS_CONVERGED).all(), robust_status
    assert np.isfinite(np.asarray(robust.cost)).all()
    # lanes where the plain loop converged: same optimum
    ok = plain_status == STATUS_CONVERGED
    assert ok.any()
    np.testing.assert_allclose(
        np.asarray(robust.cost)[ok], np.asarray(plain.cost)[ok], rtol=1e-5
    )


def test_fddp_with_ddp_curvature():
    """solve_fddp(ddp=True): the robust way to run full DDP — the adaptive
    mu absorbs the indefiniteness the exact curvature introduces (bare
    solve(ddp=True) NaNs on this case)."""
    params, cost, traj0, dt = _hard()
    bare_ddp = solve(params, cost, traj0, dt, _OPTS, ddp=True)
    assert int(bare_ddp.status) == STATUS_LINE_SEARCH_FAILED  # the premise
    res = solve_fddp(params, cost, traj0, dt, _OPTS, ddp=True)
    assert int(res.status) == STATUS_CONVERGED
    assert np.isfinite(float(res.cost))
    gap = float(jnp.abs(defects(params, res.trajectory, dt)).max())
    assert gap < 1e-8
    # same optimum as the plain-FDDP rescue
    plain_fddp = solve_fddp(params, cost, traj0, dt, _OPTS)
    np.testing.assert_allclose(
        float(res.cost), float(plain_fddp.cost), rtol=1e-5
    )


def test_solve_batch_solver_dispatch():
    """parallel.batch.solve_batch(solver=...) reaches the robust loops."""
    from quadrotorilqr_tpu.parallel.batch import solve_batch

    params, cost, traj0, dt = _hard()
    init = jax.tree.map(lambda leaf: leaf[None], traj0)
    res = solve_batch(params, cost, init, dt, _OPTS, solver="fddp-ddp")
    assert int(res.status[0]) == STATUS_CONVERGED
    ref = solve_fddp(params, cost, traj0, dt, _OPTS, ddp=True)
    np.testing.assert_allclose(float(res.cost[0]), float(ref.cost), rtol=1e-12)

    import pytest

    with pytest.raises(ValueError):
        solve_batch(params, cost, init, dt, _OPTS, solver="nope")


def test_model_generic_wrench():
    n, dt = 24, 0.1
    params = wm.WrenchParams.create(
        mass_kg=1.5,
        inertia=jnp.asarray(np.diag([0.02, 0.03, 0.04]), F64),
        g_mpss=9.81,
    )
    key = jax.random.PRNGKey(6)
    k1, k2 = jax.random.split(key)
    x0 = qm.State(
        pose=se3.exp(1.5 * jax.random.normal(k1, (6,), F64)),
        vel=1.0 * jax.random.normal(k2, (6,), F64),
    )
    grav_u = jnp.zeros((n, 6), F64).at[:, 2].set(1.5 * 9.81)
    desired = Trajectory(
        times=dt * jnp.arange(n, dtype=F64),
        states=qm.State(pose=se3.identity((n,), F64), vel=jnp.zeros((n, 6), F64)),
        controls=grav_u,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.diag(jnp.asarray([100.0] * 6 + [1.0] * 6, F64)),
        R=0.01 * jnp.eye(6, dtype=F64),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    traj0 = initial_trajectory_from_state(x0, desired)
    res = solve_fddp(params, cost, traj0, dt, _OPTS, model=wm)
    assert int(res.status) == STATUS_CONVERGED
    gap = float(jnp.abs(defects(params, res.trajectory, dt, wm)).max())
    assert gap < 1e-8


def test_fddp_control_limits():
    """FDDP + box constraints: non-binding bounds reproduce the
    unconstrained robust solve; binding bounds stay feasible on a scenario
    the reference loop cannot solve at all."""
    params, cost, traj0, dt = _hard()
    free = solve_fddp(params, cost, traj0, dt, _OPTS)

    wide = solve_fddp(params, cost, traj0, dt, _OPTS, limits=(-1e6, 1e6))
    assert int(wide.status) == STATUS_CONVERGED
    np.testing.assert_allclose(float(wide.cost), float(free.cost), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(wide.trajectory.controls),
        np.asarray(free.trajectory.controls),
        atol=1e-5,
    )

    u_free = np.asarray(free.trajectory.controls)
    # tight enough that the feasible set excludes the unconstrained optimum;
    # WHICH bound saturates depends on the basin this multi-modal aggressive
    # scenario lands in (line-search schedule changes legitimately move it),
    # so accept either — tight.cost > free.cost below proves the constraint
    # is not vacuous.
    hi = 0.4 * float(u_free.max())
    lo = -5.0
    tight = solve_fddp(params, cost, traj0, dt, _OPTS, limits=(lo, hi))
    assert int(tight.status) == STATUS_CONVERGED
    u = np.asarray(tight.trajectory.controls)
    assert u.max() <= hi + 1e-10 and u.min() >= lo - 1e-10
    at_hi = (np.abs(u - hi) < 1e-8).any()
    at_lo = (np.abs(u - lo) < 1e-8).any()
    assert at_hi or at_lo  # some bound binds
    gap = float(jnp.abs(defects(params, tight.trajectory, dt)).max())
    assert gap < 1e-8
    # saturation costs performance: constrained optimum is worse
    assert float(tight.cost) > float(free.cost)


def test_fddp_limits_match_solve_box_on_benign():
    """Where the exact reference-loop box solver works, FDDP + limits lands
    on the same constrained optimum."""
    from quadrotorilqr_tpu.solver.constrained import solve_box

    params, cost, traj0, dt = _benign()
    lo, hi = 0.5, 3.1  # binding: hover thrust ~2.45 N/rotor
    ref = solve_box(params, cost, traj0, dt, lo, hi, _OPTS)
    assert int(ref.status) == STATUS_CONVERGED
    res = solve_fddp(params, cost, traj0, dt, _OPTS, limits=(lo, hi))
    assert int(res.status) == STATUS_CONVERGED
    np.testing.assert_allclose(float(res.cost), float(ref.cost), rtol=1e-6)
    du = np.abs(
        np.asarray(res.trajectory.controls - ref.trajectory.controls)
    )
    assert du.max() < 1e-3, du.max()


def test_solve_batch_limits_dispatch():
    """solve_batch(limits=...) routes: ilqr -> solve_box, fddp -> clamped
    box-QP variant; ddp+limits raises."""
    from quadrotorilqr_tpu.parallel.batch import solve_batch
    from quadrotorilqr_tpu.solver.constrained import solve_box

    params, cost, traj0, dt = _benign()
    init = jax.tree.map(lambda leaf: leaf[None], traj0)
    lo, hi = 0.5, 3.1

    a = solve_batch(params, cost, init, dt, _OPTS, limits=(lo, hi))
    ref = solve_box(params, cost, traj0, dt, lo, hi, _OPTS)
    np.testing.assert_allclose(float(a.cost[0]), float(ref.cost), rtol=1e-12)

    b = solve_batch(
        params, cost, init, dt, _OPTS, solver="fddp", limits=(lo, hi)
    )
    assert int(b.status[0]) == STATUS_CONVERGED
    u = np.asarray(b.trajectory.controls)
    assert u.max() <= hi + 1e-10 and u.min() >= lo - 1e-10

    import pytest

    with pytest.raises(ValueError, match="fddp-ddp"):
        solve_batch(params, cost, init, dt, _OPTS, solver="ddp", limits=(lo, hi))


def test_gap_tol_dtype_resolution():
    """FDDPOptions.gap_tol=None resolves per solve dtype (VERDICT r2 #6):
    1e-8 under f64, 1e-5 under f32 — so DEFAULT options converge in BOTH
    dtypes instead of silently exhausting every f32 lane's budget (the f32
    gap floor is ~1e-5; a fixed 1e-8 default is unreachable there).
    Explicit values are honored verbatim in any dtype."""
    from quadrotorilqr_tpu.solver.fddp import FDDPOptions, resolve_gap_tol

    assert resolve_gap_tol(FDDPOptions(), jnp.float64) == 1e-8
    assert resolve_gap_tol(FDDPOptions(), jnp.float32) == 1e-5
    assert resolve_gap_tol(FDDPOptions(), jnp.bfloat16) == 1e-5
    # explicit wins, including an explicit 0.0 (used to disable the
    # feasibility certificate in fixed-budget accuracy tests)
    assert resolve_gap_tol(FDDPOptions(gap_tol=3e-7), jnp.float32) == 3e-7
    assert resolve_gap_tol(FDDPOptions(gap_tol=0.0), jnp.float64) == 0.0


def test_default_options_converge_in_f32():
    """The round-2 footgun, pinned: default-constructed FDDPOptions on an
    f32 benign solve must report STATUS_CONVERGED (not STATUS_MAX_ITERS).
    The same default in f64 keeps the tight 1e-8 feasibility certificate."""
    params, cost, traj0, dt = _benign()

    def cast(tree):
        return jax.tree.map(lambda l: l.astype(jnp.float32), tree)

    params32 = qm.QuadrotorParams.create(
        1.0,
        jnp.asarray(np.diag([0.01, 0.012, 0.02]), jnp.float32),
        0.17,
        0.016,
        9.81,
    )
    res32 = solve_fddp(params32, cast(cost), cast(traj0), dt, _OPTS)
    assert int(res32.status) == STATUS_CONVERGED, int(res32.status)

    res64 = solve_fddp(params, cost, traj0, dt, _OPTS)
    assert int(res64.status) == STATUS_CONVERGED
    gap = float(jnp.abs(defects(params, res64.trajectory, dt)).max())
    assert gap < 1e-8, gap
