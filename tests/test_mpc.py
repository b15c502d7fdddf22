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
