"""Quadratic Lie-residual tracking cost with Gauss-Newton differentials.

Re-derivation of the reference cost (/root/reference/src/cost.hh:36-61):

    J(x, u, i) = dx' Q dx + du' R du          (NO 1/2 factor, cost.hh:47-48)
    dx = x (-) x_d[i]  (12-dim Lie residual),  du = u - u_d[i]

Differentials (cost.hh:50-58) use ONLY the Jacobian of the residual w.r.t.
the lhs state (Gauss-Newton: the curvature of the group (-) is ignored):

    C.x  = 2 dx' Q J_dx        C.xx = 2 J_dx' Q J_dx
    C.u  = 2 du' R             C.uu = 2 R
    C.xu = 0

where J_dx = d(x (-) x_d)/dx = I12 with the SE(3) block Jr^-1(dx_pose).

The desired trajectory is stored stacked (structure-of-arrays, leading axis =
horizon), so a stage cost is a gather + two tiny quadratic forms — ideal for
vmap over both stages and scenarios.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models import quadrotor as qm
from ..models.quadrotor import State


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class QuadraticTrackingCost:
    """Cost parameters: Q (12,12), R (4,4), desired stacked trajectory.

    All leaves may carry leading batch dims for per-scenario weights
    (BASELINE.json config 3).

    `stage_weights` (optional, (..., N)) multiplies the FULL stage cost
    (state and control terms) per stage — terminal-cost emphasis
    (w = [1,...,1,w_T]) and time-varying weighting, a standard
    trajectory-optimization feature the reference lacks (cost.hh treats
    every stage identically). Supported EVERYWHERE: all XLA solver paths
    (solve / solve_batch / ddp / fddp / auglag / solve_box) and all fused
    kernel engines (batch loop, whole-solve, streamed — shared or
    per-scenario weights; lane-for-lane parity tested in
    tests/test_stage_weights.py).
    """

    Q: jax.Array  # (..., 12, 12)
    R: jax.Array  # (..., 4, 4)
    desired_states: State  # leaves with leading (..., N)
    desired_controls: jax.Array  # (..., N, 4)
    stage_weights: jax.Array | None = None  # (..., N) or None


def stage_cost(cost: QuadraticTrackingCost, x: State, u, i):
    """Scalar stage cost (cost.hh:47-48 semantics, no 1/2)."""
    with jax.default_matmul_precision("highest"):
        x_d = jax.tree.map(lambda leaf: leaf[..., i, :], cost.desired_states)
        u_d = cost.desired_controls[..., i, :]
        dx = qm.minus(x, x_d)
        du = u - u_d
        j = _quadform(dx, cost.Q) + _quadform(du, cost.R)
        if cost.stage_weights is not None:
            j = j * cost.stage_weights[..., i]
        return j


def _quadform(v, m):
    return jnp.einsum(
        "...i,...ij,...j->...", v, m, v, precision=jax.lax.Precision.HIGHEST
    )


def stage_cost_with_diffs(cost: QuadraticTrackingCost, x: State, u, x_d: State, u_d):
    """(J, C_x, C_u, C_xx, C_uu) for one stage given the gathered targets.

    C_xu is identically zero (cost.hh:57) and never materialized — the solver
    exploits this (Q.xu = J_x' v_xx J_u exactly).
    """
    with jax.default_matmul_precision("highest"):
        return _stage_cost_with_diffs_hp(cost, x, u, x_d, u_d)


def _stage_cost_with_diffs_hp(cost, x, u, x_d, u_d):
    dx, j_dx, _ = qm.minus_jacobians(x, x_d)
    du = u - u_d
    q_dx = jnp.einsum("...ij,...j->...i", cost.Q, dx)
    r_du = jnp.einsum("...ij,...j->...i", cost.R, du)
    j = jnp.einsum("...i,...i->...", dx, q_dx) + jnp.einsum("...i,...i->...", du, r_du)
    # NOTE: reference uses 2*dx'Q J (not dx'(Q+Q') J) — asymmetric Q/R would
    # reproduce the reference's behavior, not the true gradient (cost.hh:51).
    c_x = 2.0 * jnp.einsum("...i,...ij->...j", q_dx, j_dx)
    c_xx = 2.0 * jnp.einsum("...ji,...jk,...kl->...il", j_dx, cost.Q, j_dx)
    c_u = 2.0 * r_du
    c_uu = 2.0 * cost.R
    if cost.stage_weights is not None:
        # the stage axis of x/u (second-to-last of the leaves) must line up
        # with the weights' last axis — true for the stacked quadratize call
        w = cost.stage_weights
        j = j * w
        c_x = c_x * w[..., None]
        c_u = c_u * w[..., None]
        c_xx = c_xx * w[..., None, None]
        c_uu = c_uu * w[..., None, None]
    return j, c_x, c_u, c_xx, c_uu


def cost_batched_flags(cost: QuadraticTrackingCost):
    """Pytree of bools matching `cost`: which leaves carry a leading
    per-scenario batch axis. Every leaf's unbatched core is 2-dim EXCEPT
    stage_weights ((N,) core) — never classify cost leaves by a bare
    `ndim == 3`. One definition shared by the vmap axis inference
    (parallel/batch.py), the sharded paths (parallel/mesh.py), and the
    compacting two-phase solver (solver/batched.py)."""
    return QuadraticTrackingCost(
        Q=cost.Q.ndim == 3,
        R=cost.R.ndim == 3,
        desired_states=jax.tree.map(lambda a: a.ndim == 3, cost.desired_states),
        desired_controls=cost.desired_controls.ndim == 3,
        stage_weights=(
            None if cost.stage_weights is None else cost.stage_weights.ndim == 2
        ),
    )


def gather_stage(cost: QuadraticTrackingCost, i):
    """(x_d, u_d) at stage i (supports traced i via dynamic indexing)."""
    x_d = jax.tree.map(
        lambda leaf: jnp.take(leaf, i, axis=leaf.ndim - 2), cost.desired_states
    )
    u_d = jnp.take(cost.desired_controls, i, axis=cost.desired_controls.ndim - 2)
    return x_d, u_d


def trajectory_cost(cost: QuadraticTrackingCost, states: State, controls):
    """Total cost of a stacked trajectory (ilqr.hh:89-95), vectorized over the
    horizon instead of the reference's sequential loop."""
    with jax.default_matmul_precision("highest"):
        return _trajectory_cost_hp(cost, states, controls)


def per_stage_costs(cost: QuadraticTrackingCost, states: State, controls):
    """Per-stage cost vector (..., N) — the summands of trajectory_cost.
    The FDDP line search folds these with per-stage saturation
    (solver/fddp._saturating_stage_cost_add), matching the fused kernels'
    sequential accumulation."""
    with jax.default_matmul_precision("highest"):
        return _per_stage_costs_hp(cost, states, controls)


def _per_stage_costs_hp(cost, states, controls):
    dx = qm.minus(states, cost.desired_states)
    du = controls - cost.desired_controls
    per_stage = jnp.einsum(
        "...ni,...ij,...nj->...n", dx, cost.Q, dx
    ) + jnp.einsum("...ni,...ij,...nj->...n", du, cost.R, du)
    if cost.stage_weights is not None:
        per_stage = per_stage * cost.stage_weights
    return per_stage


def _trajectory_cost_hp(cost, states, controls):
    return jnp.sum(_per_stage_costs_hp(cost, states, controls), axis=-1)
