"""Long-horizon float32 stability (per-stage v_xx symmetrization).

Without the symmetrization in backward._riccati_stage / ilqr backward_pass,
f32 amplifies v_xx's roundoff asymmetry exponentially along the Riccati
recursion (rel asym 9e-8 in f64 vs ~1.9 in raw f32 at N=512 on the hover
workload), exploding v_xx ~20,000x, driving Quu indefinite, and NaN'ing
EVERY f32 engine past N~500 — which silently invalidated long-horizon
throughput numbers. These tests pin finiteness at N=512 on both the XLA
path and the streamed kernel (the long-horizon engine)."""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.app.workloads import long_horizon_problem
from quadrotorilqr_tpu.solver.options import (
    ConvergenceCriteria,
    ILQROptions,
    LineSearchParams,
)

N = 512


def _problem_f32(batch):
    return long_horizon_problem(batch, N, jnp.float32)


def test_xla_f32_backward_finite_at_512():
    from quadrotorilqr_tpu.solver.ilqr import backward_pass

    params, cost, trajs = _problem_f32(batch=2)
    t0 = jax.tree.map(lambda a: a[0], trajs)
    ks, big_ks, qutk, ktquuk = backward_pass(params, cost, t0, 0.02)
    assert np.isfinite(np.asarray(ks)).all()
    assert np.isfinite(np.asarray(big_ks)).all()
    assert np.isfinite(float(qutk)) and np.isfinite(float(ktquuk))


def test_xla_f32_solve_finite_at_512():
    from quadrotorilqr_tpu.solver.ilqr import solve

    params, cost, trajs = _problem_f32(batch=2)
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-6, 1e-6, 2),
    )
    res = jax.vmap(lambda t: solve(params, cost, t, 0.02, options))(trajs)
    assert np.isfinite(np.asarray(res.cost)).all()
    assert np.isfinite(np.asarray(res.trajectory.controls)).all()


def test_streamed_f32_solve_finite_at_512():
    from quadrotorilqr_tpu.kernels.stream import solve_fused_streamed

    params, cost, trajs = _problem_f32(batch=128)
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-6, 1e-6, 2),
    )
    traj, cost_v, iters, status = solve_fused_streamed(
        params, cost, trajs, 0.02, options, interpret=True, chunk=128
    )
    c = np.asarray(cost_v)
    assert np.isfinite(c).all()
    assert np.isfinite(np.asarray(traj.controls)).all()
    # the solve must also make progress, not just stay finite
    assert (np.asarray(status) != 0).any() or (np.asarray(iters) > 0).all()
