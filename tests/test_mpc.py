"""Receding-horizon MPC loop (app/mpc.py): regulation + warm-start effect."""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.app import workloads
from quadrotorilqr_tpu.app.mpc import run_mpc
from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams, State
from quadrotorilqr_tpu.solver.ilqr import Trajectory
from quadrotorilqr_tpu.solver.options import ConvergenceCriteria, ILQROptions

B = 128
DT = 0.05


def _setup(n_total=80, dtype=jnp.float64):
    params = QuadrotorParams.create(
        mass_kg=1.0,
        inertia=jnp.eye(3, dtype=dtype),
        arm_length_m=0.2,
        torque_to_thrust_ratio_m=0.016,
        g_mpss=9.81,
    )
    hover_u = jnp.full((n_total, 4), 9.81 / 4.0, dtype)
    desired = Trajectory(
        times=jnp.arange(n_total, dtype=dtype) * DT,
        states=State(
            pose=se3.identity((n_total,), dtype), vel=jnp.zeros((n_total, 6), dtype)
        ),
        controls=hover_u,
    )
    q, r = workloads.demo_weights(dtype)
    key = jax.random.PRNGKey(0)
    # position-only perturbations: with the demo weights (pose block uniformly
    # 100) large random attitude offsets make position recovery cost-neutral
    # and arbitrarily slow — not a useful regulation test
    tau = 0.2 * jax.random.normal(key, (B, 6), dtype)
    tau = tau.at[:, 3:6].set(0.0)
    x0 = State(pose=se3.exp(tau), vel=jnp.zeros((B, 6), dtype))
    return params, q, r, desired, x0


def test_mpc_regulates_to_hover():
    params, q, r, desired, x0 = _setup()
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 3)
    )
    n_steps = 55
    out = run_mpc(
        params, q, r, desired, x0,
        n_steps=n_steps, horizon=20, dt_s=DT, options=options, interpret=True,
    )
    assert out["u"].shape == (B, n_steps, 4)
    # the perturbed fleet is driven toward the hover pose at the origin
    # (2 s of simulated flight; the quad must tilt, translate, and brake)
    final_dist = np.linalg.norm(np.asarray(out["x_final"].pose.trans), axis=-1)
    initial_dist = np.linalg.norm(np.asarray(out["x_trans"][:, 0]), axis=-1)
    assert float(np.mean(final_dist)) < 0.6 * float(np.mean(initial_dist))
    # windowed tracking cost drops as the fleet locks onto the target
    cost = np.asarray(out["cost"], np.float64)
    assert cost[:, -1].mean() < 0.6 * cost[:, 0].mean()
    # warm starting pays off: later steps need fewer iLQR iterations
    iters = np.asarray(out["iterations"], np.float64)
    assert iters[:, -1].mean() <= iters[:, 0].mean()


def test_mpc_step_matches_scanned_loop():
    """The host-driven single-step path (mpc_step) replays the scanned fleet
    loop exactly — same body, so same controls and plant states."""
    from quadrotorilqr_tpu.app.mpc import mpc_step, mpc_warm_start

    params, q, r, desired, x0 = _setup()
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 2)
    )
    n_steps = 4
    out = run_mpc(
        params, q, r, desired, x0,
        n_steps=n_steps, horizon=10, dt_s=DT, options=options, interpret=True,
    )
    x, warm = x0, mpc_warm_start(desired, x0, 10)
    for k in range(n_steps):
        x, warm, u0 = mpc_step(
            params, q, r, desired, x, warm, jnp.asarray(k, jnp.int32),
            horizon=10, dt_s=DT, options=options, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(u0), np.asarray(out["u"][:, k]), atol=1e-12
        )
    np.testing.assert_allclose(
        np.asarray(x.pose.trans),
        np.asarray(out["x_final"].pose.trans),
        atol=1e-12,
    )


def test_mpc_terminal_weight_improves_tracking():
    """The MPC terminal-emphasis pattern (stage_weights=[1..1,w_T]) runs at
    kernel speed and does not degrade regulation; weights reach the solver
    (unit weights reproduce the unweighted run exactly)."""
    params, q, r, desired, x0 = _setup()
    options = ILQROptions(convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 3))
    horizon, n_steps = 20, 25
    base = run_mpc(
        params, q, r, desired, x0,
        n_steps=n_steps, horizon=horizon, dt_s=DT, options=options,
        interpret=True,
    )
    unit = run_mpc(
        params, q, r, desired, x0,
        n_steps=n_steps, horizon=horizon, dt_s=DT, options=options,
        interpret=True, stage_weights=jnp.ones((horizon,), jnp.float64),
    )
    np.testing.assert_array_equal(np.asarray(base["u"]), np.asarray(unit["u"]))

    w = jnp.ones((horizon,), jnp.float64).at[-1].set(20.0)
    term = run_mpc(
        params, q, r, desired, x0,
        n_steps=n_steps, horizon=horizon, dt_s=DT, options=options,
        interpret=True, stage_weights=w,
    )
    # still regulates: final position error comparable or better
    def final_err(out):
        return float(np.linalg.norm(np.asarray(out["x_final"].pose.trans), axis=-1).mean())

    assert final_err(term) < 1.5 * final_err(base)
    assert (np.asarray(term["status"]) != 2).all()


def test_mpc_with_control_limits():
    """limits=(lo, hi) enforces rotor saturation inside the MPC solves: the
    applied controls respect the box by construction, the bounds actually
    bind during the aggressive transient, and the fleet still regulates."""
    params, q, r, desired, x0 = _setup()
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 3)
    )
    lo, hi = 0.0, 2.9  # hover thrust ~2.45 N/rotor: binds while braking
    out = run_mpc(
        params, q, r, desired, x0,
        n_steps=25, horizon=16, dt_s=DT, options=options, interpret=True,
        limits=(lo, hi),
    )
    u = np.asarray(out["u"])
    assert u.max() <= hi + 1e-9 and u.min() >= lo - 1e-9
    assert (u >= hi - 1e-6).sum() > 0, "bounds must actually bind"
    final_dist = np.linalg.norm(np.asarray(out["x_final"].pose.trans), axis=-1)
    initial_dist = np.linalg.norm(np.asarray(out["x_trans"][:, 0]), axis=-1)
    assert float(np.mean(final_dist)) < 0.8 * float(np.mean(initial_dist))


def test_mpc_robust_fddp_recovers_tumble():
    """solver="fddp" runs the robust multiple-shooting kernel inside the MPC
    loop: a tumbling fleet whose FIRST window kills the exact loop (trip-0
    rollout divergence -> line-search failure) is recovered."""
    from quadrotorilqr_tpu.models.quadrotor import STATE_DIM  # noqa: F401
    from quadrotorilqr_tpu.solver import STATUS_LINE_SEARCH_FAILED

    dtype = jnp.float64
    params = QuadrotorParams.create(
        mass_kg=1.0,
        inertia=jnp.asarray(np.diag([0.01, 0.012, 0.02]), dtype),
        arm_length_m=0.17,
        torque_to_thrust_ratio_m=0.016,
        g_mpss=9.81,
    )
    n_total = 60
    dt = 0.1  # coarse: the gyroscopic-blowup regime
    hover_u = jnp.full((n_total, 4), 9.81 / 4.0, dtype)
    desired = Trajectory(
        times=jnp.arange(n_total, dtype=dtype) * dt,
        states=State(
            pose=se3.identity((n_total,), dtype),
            vel=jnp.zeros((n_total, 6), dtype),
        ),
        controls=hover_u,
    )
    q = jnp.diag(jnp.asarray([100.0] * 6 + [1.0] * 6, dtype))
    r = 1e-3 * jnp.eye(4, dtype=dtype)
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x0 = State(
        pose=se3.exp(2.0 * jax.random.normal(k1, (B, 6), dtype)),
        vel=2.0 * jax.random.normal(k2, (B, 6), dtype),
    )
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 8)
    )
    exact = run_mpc(
        params, q, r, desired, x0,
        n_steps=6, horizon=16, dt_s=dt, options=options, interpret=True,
    )
    robust = run_mpc(
        params, q, r, desired, x0,
        n_steps=6, horizon=16, dt_s=dt, options=options, interpret=True,
        solver="fddp",
    )
    # premise: the exact loop loses a meaningful slice of the fleet on the
    # first window (diverged rollout -> failed line search / nonfinite cost)
    exact_first = np.asarray(exact["status"][:, 0])
    assert (exact_first == STATUS_LINE_SEARCH_FAILED).mean() > 0.1
    # the robust solver never line-search-fails and keeps every cost finite
    rob_status = np.asarray(robust["status"])
    assert (rob_status == STATUS_LINE_SEARCH_FAILED).mean() == 0.0
    assert np.isfinite(np.asarray(robust["cost"])).all()
    assert np.isfinite(np.asarray(robust["u"])).all()
    # and the tumble is actually being arrested (angular rate drops)
    w_final = np.linalg.norm(np.asarray(robust["x_final"].vel[:, 3:6]), axis=-1)
    w_init = np.linalg.norm(np.asarray(x0.vel[:, 3:6]), axis=-1)
    assert float(np.median(w_final)) < float(np.median(w_init))


def test_mpc_per_scenario_params():
    """A heterogeneous fleet (per-vehicle mass/inertia Monte-Carlo) through
    the scanned MPC loop: the windowed solves and the plant step both
    consume batched params, and the fleet still regulates."""
    dtype = jnp.float64
    rng = np.random.default_rng(6)
    b = B
    diags = rng.uniform(0.6, 1.4, size=(b, 3))
    inertias = np.stack([np.diag(d) for d in diags])
    params_b = QuadrotorParams(
        mass_kg=jnp.asarray(rng.uniform(0.8, 1.3, size=(b,)), dtype),
        inertia=jnp.asarray(inertias, dtype),
        arm_length_m=jnp.full((b,), 0.2, dtype),
        torque_to_thrust_ratio_m=jnp.full((b,), 0.016, dtype),
        g_mpss=jnp.full((b,), 9.81, dtype),
    )
    _, q, r, desired, x0 = _setup()
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 3)
    )
    out = run_mpc(
        params_b, q, r, desired, x0,
        n_steps=20, horizon=16, dt_s=DT, options=options, interpret=True,
    )
    assert np.isfinite(np.asarray(out["u"])).all()
    final_dist = np.linalg.norm(np.asarray(out["x_final"].pose.trans), axis=-1)
    initial_dist = np.linalg.norm(np.asarray(out["x_trans"][:, 0]), axis=-1)
    assert float(np.mean(final_dist)) < 0.8 * float(np.mean(initial_dist))
