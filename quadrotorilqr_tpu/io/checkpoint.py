"""Checkpoint / resume for batched solve artifacts (orbax-backed).

The reference's only persistence is proto serialization of single
trajectories (SURVEY.md §5.4); proto stays the interchange format
(io/proto.py, wire-compatible). This module adds what production-scale runs
need: saving/restoring whole batched `SolveResult` pytrees (e.g. a
65k-scenario Monte-Carlo trajectory library, BASELINE.json config 5) and MPC
warm-start state, preserving shardings where possible.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

from ..solver.ilqr import SolveResult


def save_pytree(path: str, tree, metadata: dict | None = None):
    """Save any pytree of arrays via orbax; metadata lands in metadata.json."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree)
    if metadata:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2)


def load_pytree(path: str, target=None, sharding=None):
    """Restore a pytree saved with `save_pytree`.

    `target` (optional) is a pytree of like-structured arrays (or
    ShapeDtypeStructs) used to restore dataclass containers + shardings;
    without it the raw nested-dict representation is returned.

    `sharding` (optional, exclusive with `target`) is a single
    `jax.sharding.Sharding` applied to EVERY restored array — the common
    case of restoring a scenario-batched checkpoint onto a device mesh
    (arrays land sharded directly, no host-side gather + device_put)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, item=target)
        if sharding is not None:
            meta = ckptr.metadata(path)
            restore_args = jax.tree.map(
                lambda m: ocp.ArrayRestoreArgs(
                    sharding=sharding, dtype=m.dtype, restore_type=jax.Array
                ),
                meta.item_metadata if hasattr(meta, "item_metadata") else meta,
            )
            return ckptr.restore(
                path, args=ocp.args.PyTreeRestore(restore_args=restore_args)
            )
        return ckptr.restore(path)


def save_solve_result(path: str, result: SolveResult, metadata: dict | None = None):
    """Checkpoint a (possibly sharded) batched SolveResult."""
    meta = {"type": "SolveResult", "has_debug": result.debug is not None}
    meta.update(metadata or {})
    save_pytree(path, dataclasses.asdict(result), meta)


def load_solve_result(path: str, sharding=None) -> SolveResult:
    """Restore a SolveResult checkpoint (debug restored if present).

    `sharding` (optional): a `jax.sharding.Sharding` over the scenario batch
    axis — every array is restored directly onto the mesh (e.g. resuming a
    65k-scenario Monte-Carlo library on a different host/chip topology)."""
    from ..lie.se3 import SE3
    from ..models.quadrotor import State
    from ..solver.ilqr import IterDebug, Trajectory

    raw = load_pytree(path, sharding=sharding)

    def to_traj(d):
        return Trajectory(
            times=d["times"],
            states=State(
                pose=SE3(quat=d["states"]["pose"]["quat"], trans=d["states"]["pose"]["trans"]),
                vel=d["states"]["vel"],
            ),
            controls=d["controls"],
        )

    debug = raw.get("debug")
    if debug is not None:
        debug = IterDebug(
            trajectories=to_traj(debug["trajectories"]),
            costs=debug["costs"],
            valid=debug["valid"],
        )
    return SolveResult(
        trajectory=to_traj(raw["trajectory"]),
        cost=raw["cost"],
        iterations=raw["iterations"],
        status=raw["status"],
        debug=debug,
    )
