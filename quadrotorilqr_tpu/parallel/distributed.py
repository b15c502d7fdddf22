"""Multi-host / multi-process wiring (`jax.distributed`) — SURVEY.md §5.8.

The mesh/collective layer (parallel/mesh.py) is host-count agnostic: it
builds the scenario mesh over ALL global devices and lets XLA route
collectives over ICI within a slice and DCN across hosts. What it cannot do
alone is turn N independent processes into one JAX runtime — that bootstrap
lives here, together with the array-construction helpers multi-process JAX
requires (a process only addresses its local devices, so global scenario
batches must be assembled from per-process local shards rather than
`device_put` from one host).

Typical multi-host flow (per process):

    from quadrotorilqr_tpu.parallel import distributed, mesh

    distributed.initialize()               # TPU pods: auto-detected
    m = mesh.make_scenario_mesh()          # all global devices
    lo, n = distributed.local_scenario_slice(GLOBAL_B, m)
    local_trajs = build_problem(slice(lo, lo + n))        # local shard only
    trajs = distributed.distribute_batch(local_trajs, m)  # global jax.Arrays
    result, stats = mesh.solve_sharded_with_stats(..., trajs, ..., m)
    # result leaves are global arrays; this process's rows:
    mine = distributed.process_local_data(result.cost)

Exercised for real by tests/test_distributed.py: two CPU processes (gloo
collectives, local coordinator) run solve_sharded / solve_sharded_with_stats
across the process boundary and check against the single-process solver.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import SCENARIO_AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> None:
    """`jax.distributed.initialize` wrapper, safe to call more than once.

    With no arguments, relies on cluster auto-detection (TPU pods, most
    managed clusters). For manual bring-up (the CPU test; bare-metal hosts),
    pass coordinator_address="host:port", num_processes, process_id.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:  # already initialized — keep going
        if "already" not in str(e).lower():
            raise


def shutdown() -> None:
    """Tear down the distributed runtime (end of multi-process programs)."""
    jax.distributed.shutdown()


def is_distributed() -> bool:
    return jax.process_count() > 1


def local_scenario_slice(global_batch: int, mesh) -> tuple[int, int]:
    """(start, length) of this process's contiguous scenario rows under a
    scenario-sharded layout on `mesh`. Requires the global batch to divide
    evenly over processes (pad upstream otherwise).

    Assumes the standard device enumeration (jax.devices() groups each
    process's devices contiguously in process order), which is how
    make_scenario_mesh builds the 1-D mesh — a custom device permutation
    would break the contiguity this helper relies on."""
    procs = jax.process_count()
    if global_batch % procs:
        raise ValueError(
            f"global batch {global_batch} must divide over {procs} processes"
        )
    per = global_batch // procs
    return jax.process_index() * per, per


def distribute_batch(local_tree, mesh, axis_name: str = SCENARIO_AXIS):
    """Assemble global scenario-sharded jax.Arrays from each process's LOCAL
    slice of the batch (leaves (B_local, ...) -> global (B_local * P, ...)).

    Single-process this is just a sharded device_put; multi-process it uses
    `jax.make_array_from_process_local_data` so no host ever materializes
    the full batch.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    procs = jax.process_count()

    def place(leaf):
        local = np.asarray(leaf)
        gshape = (local.shape[0] * procs,) + local.shape[1:]
        return jax.make_array_from_process_local_data(sharding, local, gshape)

    return jax.tree.map(place, local_tree)


def process_local_data(array: jax.Array) -> np.ndarray:
    """This process's rows of a scenario-sharded global array, concatenated
    in ascending global order."""
    shards = sorted(
        array.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
