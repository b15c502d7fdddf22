"""The supertile layout composed with the device mesh (VERDICT r4 #2):
solve_sharded_fused / solve_sharded_fddp run each shard's whole-solve
kernel in the dense-register (r, c, 8, 128) layout.

Parity contract: sharded-supertile results equal the UNSHARDED supertile
engine lane-for-lane — statuses and iteration counts exactly, values at
cross-program tolerance (XLA fuses FMA differently per program; see
tests/test_parallel_refine.py's docstring for why bit equality across
programs is not a property interpret mode has)."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.parallel.mesh import (
    make_scenario_mesh,
    solve_sharded_fddp,
    solve_sharded_fused,
)
from quadrotorilqr_tpu.solver.batched import (
    solve_batch_fddp,
    solve_batch_fddp_refine,
    solve_batch_latency,
)
from tests.test_fddp_supertile import _OPTS as _FOPTS
from tests.test_fddp_supertile import _mixed_problem
from tests.test_supertile import _OPTS, _problem


def _assert_close(got, ref):
    np.testing.assert_array_equal(
        np.asarray(got.status), np.asarray(ref.status)
    )
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-7, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(got.trajectory.controls),
        np.asarray(ref.trajectory.controls),
        atol=1e-6,
    )


def test_sharded_supertile_matches_unsharded():
    """2-device mesh, 1024 scenarios per shard = one supertile grid step
    per device."""
    params, cost, trajs, dt = _problem(2048)
    ref = solve_batch_latency(
        params, cost, trajs, dt, _OPTS, interpret=True, supertile=True
    )
    mesh = make_scenario_mesh(jax.devices()[:2])
    got, stats = solve_sharded_fused(
        params, cost, trajs, dt, _OPTS, mesh, interpret=True, supertile=True
    )
    _assert_close(got, ref)
    assert int(stats["n_converged"]) == int(
        (np.asarray(ref.status) == 1).sum()
    )


def test_sharded_supertile_single_device_neutral():
    """A 1-device mesh is the degenerate case: the sharded supertile path
    must agree with the direct engine call (same kernel, shard_map of one
    shard)."""
    params, cost, trajs, dt = _problem(1024)
    ref = solve_batch_latency(
        params, cost, trajs, dt, _OPTS, interpret=True, supertile=True
    )
    mesh = make_scenario_mesh(jax.devices()[:1])
    got, _ = solve_sharded_fused(
        params, cost, trajs, dt, _OPTS, mesh, interpret=True, supertile=True
    )
    _assert_close(got, ref)


def test_sharded_fddp_supertile_matches_unsharded():
    params, cost, trajs, dt = _mixed_problem(2048)
    ref = solve_batch_fddp(
        params, cost, trajs, dt, _FOPTS, interpret=True, supertile=True
    )
    mesh = make_scenario_mesh(jax.devices()[:2])
    got, stats = solve_sharded_fddp(
        params, cost, trajs, dt, _FOPTS, mesh, interpret=True,
        supertile=True,
    )
    _assert_close(got, ref)
    assert int(stats["n_converged"]) > 1024


def test_sharded_fddp_refine_supertile():
    """The cross-device straggler rebalance runs its phases in the
    supertile layout (per-shard batch 1024 = whole supertiles); parity vs
    the single-device supertile refine."""
    params, cost, trajs, dt = _mixed_problem(2048)
    ref = solve_batch_fddp_refine(
        params, cost, trajs, dt, _FOPTS, phase1_iters=(8,),
        ddp=(False, True), interpret=True, supertile=True,
    )
    mesh = make_scenario_mesh(jax.devices()[:2])
    got, _ = solve_sharded_fddp(
        params, cost, trajs, dt, _FOPTS, mesh, interpret=True,
        refine=(8,), ddp=(False, True), supertile=True,
    )
    _assert_close(got, ref)
