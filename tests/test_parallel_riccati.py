"""Associative-scan Riccati (solver/parallel_riccati.py) vs the sequential pass."""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.solver import ilqr as seq
from quadrotorilqr_tpu.solver.parallel_riccati import backward_pass_assoc

from test_kernel_backward import _problem


def _single(trajs, i=0):
    return jax.tree.map(lambda a: a[i], trajs)


def test_assoc_matches_sequential():
    params, cost, trajs = _problem(n=25)
    traj = _single(trajs)
    dt = 0.02

    ks_a, big_ks_a, qutk_a, ktquuk_a = backward_pass_assoc(params, cost, traj, dt)
    ks_s, big_ks_s, qutk_s, ktquuk_s = seq.backward_pass(params, cost, traj, dt)

    np.testing.assert_allclose(np.asarray(ks_a), np.asarray(ks_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(big_ks_a), np.asarray(big_ks_s), atol=1e-8)
    np.testing.assert_allclose(float(qutk_a), float(qutk_s), rtol=1e-8)
    np.testing.assert_allclose(float(ktquuk_a), float(ktquuk_s), rtol=1e-8)


def test_assoc_matches_sequential_with_reg():
    params, cost, trajs = _problem(n=9)
    traj = _single(trajs, 3)
    ks_a, big_ks_a, qutk_a, _ = backward_pass_assoc(
        params, cost, traj, 0.02, quu_reg=1e-3
    )
    ks_s, big_ks_s, qutk_s, _ = seq.backward_pass(
        params, cost, traj, 0.02, quu_reg=1e-3
    )
    np.testing.assert_allclose(np.asarray(ks_a), np.asarray(ks_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(big_ks_a), np.asarray(big_ks_s), atol=1e-8)
    np.testing.assert_allclose(float(qutk_a), float(qutk_s), rtol=1e-8)


def test_assoc_vmaps_over_batch():
    params, cost, trajs = _problem(n=6)
    sub = jax.tree.map(lambda a: a[:8], trajs)
    ks_b, big_ks_b, qutk_b, _ = jax.vmap(
        lambda t: backward_pass_assoc(params, cost, t, 0.02)
    )(sub)
    ks_s, _, qutk_s, _ = jax.vmap(
        lambda t: seq.backward_pass(params, cost, t, 0.02)
    )(sub)
    assert ks_b.shape == (8, 6, 4)
    np.testing.assert_allclose(np.asarray(ks_b), np.asarray(ks_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(qutk_b), np.asarray(qutk_s), rtol=1e-8)


def test_full_solve_with_associative_backward():
    """solve(associative=True) end-to-end matches the sequential solve."""
    from quadrotorilqr_tpu.solver.ilqr import solve
    from quadrotorilqr_tpu.solver.options import ConvergenceCriteria, ILQROptions

    params, cost, trajs = _problem(n=10)
    traj = _single(trajs, 1)
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, 8)
    )
    r_seq = solve(params, cost, traj, 0.02, options)
    r_par = solve(params, cost, traj, 0.02, options, associative=True)
    assert int(r_par.status) == int(r_seq.status)
    assert int(r_par.iterations) == int(r_seq.iterations)
    np.testing.assert_allclose(float(r_par.cost), float(r_seq.cost), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(r_par.trajectory.controls),
        np.asarray(r_seq.trajectory.controls),
        atol=1e-7,
    )


def test_solve_batch_associative():
    """Batched integration: solve_batch(associative=True) == sequential."""
    from quadrotorilqr_tpu.parallel.batch import solve_batch
    from quadrotorilqr_tpu.solver.options import ConvergenceCriteria, ILQROptions

    params, cost, trajs = _problem(n=8)
    sub = jax.tree.map(lambda a: a[:6], trajs)
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, 5)
    )
    r_seq = solve_batch(params, cost, sub, 0.02, options)
    r_par = solve_batch(params, cost, sub, 0.02, options, associative=True)
    np.testing.assert_array_equal(np.asarray(r_par.status), np.asarray(r_seq.status))
    np.testing.assert_allclose(
        np.asarray(r_par.cost), np.asarray(r_seq.cost), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(r_par.trajectory.controls),
        np.asarray(r_seq.trajectory.controls),
        atol=1e-7,
    )


def test_associative_auto_dispatch():
    """associative="auto" applies the measured (B, N) rule
    (solver/ilqr.resolve_associative) and matches the explicit choice;
    unsupported combos (fddp / limits) never route to the associative
    pass."""
    from quadrotorilqr_tpu.parallel.batch import solve_batch
    from quadrotorilqr_tpu.solver.ilqr import (
        ASSOC_AUTO_MIN_HORIZON,
        resolve_associative,
    )
    from quadrotorilqr_tpu.solver.options import ConvergenceCriteria, ILQROptions

    # the measured frontier (benchmarks/assoc_regime.py, v5e 2026-08-20)
    assert resolve_associative(1, ASSOC_AUTO_MIN_HORIZON)
    assert resolve_associative(1, 8192)  # B=1 wins at every long horizon
    assert resolve_associative(8, 512)
    assert not resolve_associative(8, 2048)  # measured sequential win
    assert not resolve_associative(1, ASSOC_AUTO_MIN_HORIZON - 1)
    assert not resolve_associative(64, 10_000)

    params, cost, trajs = _problem(n=8)
    sub = jax.tree.map(lambda a: a[:4], trajs)
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-10, 1e-10, 4)
    )
    # B=4, N=8 -> rule says sequential: "auto" must equal explicit False
    # bit-for-bit (same program)
    r_auto = solve_batch(params, cost, sub, 0.02, options, associative="auto")
    r_seq = solve_batch(params, cost, sub, 0.02, options, associative=False)
    np.testing.assert_array_equal(
        np.asarray(r_auto.cost), np.asarray(r_seq.cost)
    )
    # auto + fddp / auto + limits run (never raising the explicit-True
    # incompatibility errors)
    r = solve_batch(
        params, cost, sub, 0.02, options, associative="auto", solver="fddp"
    )
    assert r.cost.shape == (4,)
    r = solve_batch(
        params, cost, sub, 0.02, options, associative="auto",
        limits=(0.0, 50.0),
    )
    assert r.cost.shape == (4,)
