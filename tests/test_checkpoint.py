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


def test_restore_onto_mesh():
    """Restore a batched checkpoint directly onto the 8-device scenario mesh
    (io/checkpoint.py sharding path): arrays land sharded, values intact."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from quadrotorilqr_tpu.parallel.mesh import make_scenario_mesh

    params, cost, trajs = _problem(n=4)
    trajs = jax.tree.map(lambda a: a[:16], trajs)
    res = solve_batch(
        params, cost, trajs, 0.02,
        ILQROptions(convergence_criteria=ConvergenceCriteria(1e-8, 1e-8, 2)),
    )
    mesh = make_scenario_mesh()
    sharding = NamedSharding(mesh, PartitionSpec("scenario"))
    with tempfile.TemporaryDirectory() as d:
        path = d + "/ckpt"
        save_solve_result(path, res, {"workload": "mesh-test"})
        back = load_solve_result(path, sharding=sharding)
    # every restored array is sharded over the scenario axis as requested
    for leaf in jax.tree.leaves(back):
        assert leaf.sharding.is_equivalent_to(sharding, leaf.ndim), leaf.sharding
        shard_sizes = {s.data.shape[0] for s in leaf.addressable_shards}
        assert shard_sizes == {leaf.shape[0] // 8}
    np.testing.assert_allclose(np.asarray(back.cost), np.asarray(res.cost))
    np.testing.assert_allclose(
        np.asarray(back.trajectory.controls), np.asarray(res.trajectory.controls)
    )
    np.testing.assert_array_equal(np.asarray(back.status), np.asarray(res.status))
