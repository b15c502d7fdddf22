"""Fused Pallas backward pass vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.app import workloads
from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
from quadrotorilqr_tpu.kernels.backward import TILE, backward_pass_fused
from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams
from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
from quadrotorilqr_tpu.solver import ilqr as ilqr_module


def _problem(dtype=jnp.float64, n=7):
    key = jax.random.PRNGKey(0)
    init_states, desired = workloads.hover_to_waypoint(
        key, TILE, n=n, dt_s=0.02, dtype=dtype, pose_scale=0.4
    )
    q, r = workloads.demo_weights(dtype)
    cost = QuadraticTrackingCost(
        Q=q, R=r, desired_states=desired.states, desired_controls=desired.controls
    )
    params = QuadrotorParams.create(
        mass_kg=1.3,
        inertia=jnp.asarray(np.diag([0.4, 0.5, 0.6]) + 0.05, dtype),
        arm_length_m=0.2,
        torque_to_thrust_ratio_m=0.016,
        g_mpss=9.81,
    )
    trajs = initial_trajectory_from_state(init_states, desired)
    # randomize controls so the pass sees non-trivial feedback terms
    ukey = jax.random.PRNGKey(1)
    trajs = ilqr_module.Trajectory(
        times=trajs.times,
        states=trajs.states,
        controls=trajs.controls
        + 0.5 * jax.random.normal(ukey, trajs.controls.shape, dtype),
    )
    return params, cost, trajs


def test_backward_fused_matches_xla():
    params, cost, trajs = _problem()
    dt = 0.02

    ks_f, big_ks_f, qutk_f, ktquuk_f = backward_pass_fused(
        params, cost, trajs, dt, interpret=True
    )

    ks, big_ks, qutk, ktquuk = jax.vmap(
        lambda t: ilqr_module.backward_pass(params, cost, t, dt)
    )(trajs)

    np.testing.assert_allclose(np.asarray(ks_f), np.asarray(ks), atol=1e-9)
    np.testing.assert_allclose(np.asarray(big_ks_f), np.asarray(big_ks), atol=1e-9)
    np.testing.assert_allclose(np.asarray(qutk_f), np.asarray(qutk), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(ktquuk_f), np.asarray(ktquuk), rtol=1e-9)
