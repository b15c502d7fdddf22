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
