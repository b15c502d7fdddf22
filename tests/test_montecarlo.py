"""End-to-end Monte-Carlo library generation (app/montecarlo.py): sampling,
solve, stats, checkpoint round trip, reference-proto export."""

import tempfile

import jax
import numpy as np

from quadrotorilqr_tpu.app.montecarlo import (
    export_entry_proto,
    generate_library,
    sample_params,
    save_library,
)


def test_generate_and_checkpoint_library():
    import jax.numpy as jnp

    result, stats = generate_library(
        batch=64, horizon=6, iters=3, pose_scale=0.2, dtype=jnp.float64
    )
    assert stats["batch"] == 64
    assert (
        stats["n_converged"] + stats["n_max_iters"] + stats["n_ls_failed"]
        == 64
    )
    assert result.trajectory.controls.shape == (64, 6, 4)

    with tempfile.TemporaryDirectory() as d:
        path = d + "/lib"
        save_library(path, result, stats)
        from quadrotorilqr_tpu.io.checkpoint import load_solve_result

        back = load_solve_result(path)
        np.testing.assert_allclose(
            np.asarray(back.cost), np.asarray(result.cost)
        )

    # one entry exports as the reference's wire format and parses back
    from quadrotorilqr_tpu.io.proto import trajectory_from_proto
    from quadrotorilqr_tpu.io.trajectory_pb2 import QuadrotorTrajectory

    raw = export_entry_proto(result, 3)
    msg = QuadrotorTrajectory()
    msg.ParseFromString(raw)
    traj = trajectory_from_proto(msg)
    np.testing.assert_allclose(
        np.asarray(traj.controls),
        np.asarray(result.trajectory.controls[3]),
        rtol=1e-6,
    )


def test_generate_with_randomized_params():
    """Domain randomization through the per-scenario param kernel path."""
    import jax.numpy as jnp

    result, stats = generate_library(
        batch=64, horizon=5, iters=2, pose_scale=0.1,
        randomize_params=True, dtype=jnp.float64,
    )
    assert stats["randomized_params"]
    # distinct params genuinely differentiate the lanes
    assert np.unique(np.asarray(result.cost)).size == 64


def test_sample_params_batched_contract():
    params = sample_params(jax.random.PRNGKey(0), 32)
    for leaf in jax.tree.leaves(params):
        assert leaf.shape[0] == 32
    params.validate()  # every sampled inertia is SPD


def test_generate_use_mesh_with_randomized_params():
    """Randomized per-scenario params sharded over the 8-device mesh (the
    sharded fused path takes them as scenario-sharded shard_map operands)."""
    import jax.numpy as jnp

    result, stats = generate_library(
        batch=1024, horizon=4, iters=2, pose_scale=0.1,
        randomize_params=True, use_mesh=True, dtype=jnp.float64,
    )
    assert stats["randomized_params"]
    assert "total_cost" in stats  # psum'd mesh statistics present
    np.testing.assert_allclose(
        stats["total_cost"], float(np.asarray(result.cost).sum()), rtol=1e-6
    )
    assert np.unique(np.asarray(result.cost)).size > 512


def test_robust_montecarlo_with_derated_rotors():
    """The full production robustness sweep in one program: per-scenario
    physical params (mass/inertia Monte-Carlo) + per-scenario ROTOR CEILINGS
    (actuator derating) + aggressive initial states, solved by the robust
    FDDP kernel (solver/batched.solve_batch_fddp) — every operand class
    exercises its batched path at once."""
    import jax.numpy as jnp

    from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
    from quadrotorilqr_tpu.lie import se3
    from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams, State
    from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
    from quadrotorilqr_tpu.solver.batched import solve_batch_fddp
    from quadrotorilqr_tpu.solver.ilqr import Trajectory
    from quadrotorilqr_tpu.solver.options import (
        ConvergenceCriteria,
        ILQROptions,
        LineSearchParams,
    )

    f64 = jnp.float64
    b, n, dt = 128, 10, 0.1
    rng = np.random.default_rng(11)
    diags = rng.uniform(0.008, 0.02, size=(b, 3))
    inertias = np.stack([np.diag(d) + 0.001 for d in diags])
    params_b = QuadrotorParams(
        mass_kg=jnp.asarray(rng.uniform(0.8, 1.4, size=(b,)), f64),
        inertia=jnp.asarray(inertias, f64),
        arm_length_m=jnp.asarray(rng.uniform(0.12, 0.22, size=(b,)), f64),
        torque_to_thrust_ratio_m=jnp.asarray(
            rng.uniform(0.01, 0.02, size=(b,)), f64
        ),
        g_mpss=jnp.full((b,), 9.81, f64),
    )
    hover_each = np.asarray(params_b.mass_kg) * 9.81 / 4.0
    # derated ceilings: 1.35-1.8x each vehicle's own hover thrust
    hi_b = jnp.asarray(
        hover_each[:, None] * rng.uniform(1.35, 1.8, size=(b, 4)), f64
    )
    lo_b = jnp.zeros((b, 4), f64)

    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    x0 = State(
        pose=se3.exp(0.9 * jax.random.normal(k1, (b, 6), f64)),
        vel=0.9 * jax.random.normal(k2, (b, 6), f64),
    )
    # desired hover controls are PER-SCENARIO (each vehicle's own mass)
    du_b = jnp.broadcast_to(
        jnp.asarray(hover_each, f64)[:, None, None], (b, n, 4)
    )
    desired = Trajectory(
        times=dt * jnp.arange(n, dtype=f64),
        states=State(
            pose=se3.identity((n,), f64), vel=jnp.zeros((n, 6), f64)
        ),
        controls=jnp.zeros((n, 4), f64),  # placeholder; per-lane set below
    )
    cost = QuadraticTrackingCost(
        Q=jnp.diag(jnp.asarray([100.0] * 6 + [1.0] * 6, f64)),
        R=1e-2 * jnp.eye(4, dtype=f64),
        desired_states=desired.states,
        desired_controls=du_b,
    )
    init = initial_trajectory_from_state(x0, desired)
    init = Trajectory(times=init.times, states=init.states, controls=du_b)
    opts = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 30),
        convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, 40),
    )
    res = solve_batch_fddp(
        params_b, cost, init, dt, opts, interpret=True, limits=(lo_b, hi_b)
    )
    u = np.asarray(res.trajectory.controls)
    assert (u <= np.asarray(hi_b)[:, None, :] + 1e-12).all()
    assert (u >= -1e-12).all()
    conv = np.asarray(res.status) == 1
    assert conv.mean() > 0.85, conv.mean()
    assert np.isfinite(np.asarray(res.cost)).all()
