"""Every examples/*.py runs end-to-end (CPU, small sizes).

The examples are the switching-user story (README + examples/README.md);
keeping them executable is part of the API contract.
"""

import importlib
import os
import sys

import pytest

_EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
sys.path.insert(0, _EXAMPLES_DIR)


def _load(name):
    return importlib.import_module(name)


def test_example_01_reference_parity():
    traj, debug = _load("01_reference_parity").main(n=8, max_iters=30)
    assert len(traj.points) == 8
    assert len(debug.iter_debugs) >= 1


def test_example_02_batched_throughput():
    res = _load("02_batched_throughput").main(batch=128, n=8, interpret=True)
    assert res.cost.shape == (128,)


def test_example_03_constrained_flight():
    res = _load("03_constrained_flight").main(n=12)
    assert float(res.max_violation) < 1e-5


def test_example_04_differentiable_tuning():
    log_q = _load("04_differentiable_tuning").main(n=8, steps=2)
    assert log_q.shape == (12,)


def test_example_05_robust_and_mpc():
    robust, out = _load("05_robust_and_mpc").main(mpc_steps=4)
    assert int(robust.status) == 1
    assert out["u"].shape[1] == 4


def test_example_06_integration_accuracy():
    errors, results = _load("06_integration_accuracy").main(n=10, max_iters=40)
    assert errors["rk4 (same work as substepped(4))"] < 0.05 * errors["substepped(4)"]
    assert all(int(r.status) == 1 for r in results.values())


def test_example_07_fleet_scaling():
    flat, compact, hybrid, stats = _load("07_fleet_scaling").main(
        batch=256, budget=8
    )
    assert int((hybrid.status == 1).sum()) >= int((flat.status == 1).sum())
    assert float(stats["n_converged"]) >= 0


def test_example_08_robust_constrained():
    res = _load("08_robust_constrained").main(n=8)
    import numpy as np

    assert np.isfinite(float(res.cost))
    assert float(res.max_violation) < 1e-5
