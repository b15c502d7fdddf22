"""Fused Pallas rollout+cost vs XLA forward_sim + trajectory_cost."""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.costs import quadratic as qc
from quadrotorilqr_tpu.kernels.rollout import rollout_cost_fused
from quadrotorilqr_tpu.solver import ilqr as ilqr_module

from test_kernel_backward import _problem


def test_rollout_fused_matches_xla():
    params, cost, trajs = _problem()
    dt = 0.02
    batch = trajs.controls.shape[0]

    ks, big_ks, _, _ = jax.vmap(
        lambda t: ilqr_module.backward_pass(params, cost, t, dt)
    )(trajs)
    alpha = jnp.asarray(
        np.random.default_rng(2).uniform(0.25, 1.0, size=(batch,)), trajs.controls.dtype
    )

    new_f, cost_f = rollout_cost_fused(
        params, cost, trajs, ks, big_ks, alpha, dt, interpret=True
    )

    new_x = jax.vmap(
        lambda t, k, bk, a: ilqr_module.forward_sim(params, t, k, bk, a, dt)
    )(trajs, ks, big_ks, alpha)
    cost_x = jax.vmap(lambda t: qc.trajectory_cost(cost, t.states, t.controls))(new_x)

    np.testing.assert_allclose(
        np.asarray(new_f.states.pose.quat), np.asarray(new_x.states.pose.quat), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(new_f.states.pose.trans), np.asarray(new_x.states.pose.trans), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(new_f.states.vel), np.asarray(new_x.states.vel), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(new_f.controls), np.asarray(new_x.controls), atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(cost_f), np.asarray(cost_x), rtol=1e-9)
