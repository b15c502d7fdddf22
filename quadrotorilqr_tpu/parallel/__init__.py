"""Scenario batching (vmap) and multi-chip/multi-host sharding (mesh/pjit/shard_map)."""

from .batch import batch_stats, initial_trajectory_from_state, solve_batch
from .mesh import (
    SCENARIO_AXIS,
    make_scenario_mesh,
    replicate,
    shard_scenarios,
    solve_sharded,
    solve_sharded_fused,
    solve_sharded_with_stats,
)

__all__ = [
    "solve_batch",
    "batch_stats",
    "initial_trajectory_from_state",
    "make_scenario_mesh",
    "shard_scenarios",
    "replicate",
    "solve_sharded",
    "solve_sharded_fused",
    "solve_sharded_with_stats",
    "SCENARIO_AXIS",
]
