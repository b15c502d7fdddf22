"""Orbax checkpoint round-trip for batched SolveResult (io/checkpoint.py)."""

import tempfile

import numpy as np

from quadrotorilqr_tpu.io.checkpoint import load_solve_result, save_solve_result
from quadrotorilqr_tpu.parallel.batch import solve_batch
from quadrotorilqr_tpu.solver.options import ConvergenceCriteria, ILQROptions

from test_kernel_backward import _problem


def test_solve_result_round_trip():
    params, cost, trajs = _problem(n=4)
    res = solve_batch(
        params, cost, trajs, 0.02,
        ILQROptions(convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 2)),
    )
    with tempfile.TemporaryDirectory() as d:
        path = d + "/ckpt"
        save_solve_result(path, res, {"workload": "test"})
        back = load_solve_result(path)
    np.testing.assert_array_equal(np.asarray(back.status), np.asarray(res.status))
    np.testing.assert_array_equal(
        np.asarray(back.iterations), np.asarray(res.iterations)
    )
    np.testing.assert_allclose(np.asarray(back.cost), np.asarray(res.cost))
    np.testing.assert_allclose(
        np.asarray(back.trajectory.controls), np.asarray(res.trajectory.controls)
    )
    np.testing.assert_allclose(
        np.asarray(back.trajectory.states.pose.quat),
        np.asarray(res.trajectory.states.pose.quat),
    )
