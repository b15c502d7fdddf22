"""Augmented-Lagrangian iLQR: general nonlinear inequality constraints.

The reference solver is unconstrained (/root/reference/src/ilqr.hh has no
constraint concept) and solver/constrained.py adds exact CONTROL boxes; real
missions also need STATE constraints — obstacle keep-outs, velocity/altitude
envelopes, arbitrary user inequalities mixing state and control. This module
adds the standard augmented-Lagrangian treatment (cf. PAPERS.md: ALTRO,
Howell, Jackson & Manchester, IROS 2019 — re-derived here, no code shared):

  minimize  J(traj)   s.t.  g(x_k, u_k, k) <= 0  per stage

via the PHR (Powell-Hestenes-Rockafellar) augmented cost

  phi(g; lam, mu) = (||max(0, lam + mu g)||^2 - ||lam||^2) / (2 mu)

whose exact gradient is Jg' z with z = max(0, lam + mu g), and whose
Gauss-Newton Hessian is mu Jg' diag(z > 0) Jg — the same curvature
approximation the tracking cost already uses (cost.hh:50-58 ignores the
residual curvature), so the inner solver stays an iLQR.

TPU-first structure:
  * constraints are written for ONE stage as `g(x: State, u, k) -> (n_c,)`;
    the module vmaps them across the horizon and `solve_auglag` itself
    composes with vmap over scenarios (lam tiles batch with the carry).
  * constraint Jacobians are exact autodiff lifted to the Lie tangent:
    d/dtau g(x (+) tau, u + du) at (0, 0) via jacfwd — model-generic, no
    hand-derived chain rules to keep in sync.
  * the augmented term introduces a nonzero cost cross term
    C_xu = mu Jx' diag(act) Ju, so the inner Riccati scan carries the full
    Q_xu = C_xu + J_x' V_xx J_u (solver/ilqr.py exploits C_xu == 0; here it
    cannot).
  * outer multiplier loop = lax.while_loop (fixed max trips, per-lane
    convergence under vmap); inner solve = the exact reference loop
    semantics (trip-0 full step, pre/post checks, backtracking line search)
    on the augmented cost, warm-started from the previous outer trip.

Everything jits; nested while_loops batch to masked fixed-point iteration.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..costs import quadratic as qc
from ..models import quadrotor as qm
from .ilqr import (
    STATUS_CONVERGED,
    STATUS_LINE_SEARCH_FAILED,
    STATUS_MAX_ITERS,
    Trajectory,
    expected_cost_reduction,
    forward_sim,
    is_converged,
    quadratize,
    riccati_gains_update,
)
from .options import ILQROptions

# Constraint satisfied to tolerance but the last inner solve hit its
# iteration budget (solution is feasible, optimality not certified).
STATUS_FEASIBLE_MAX_ITERS = 3
# Outer loop exhausted with violation above tolerance.
STATUS_INFEASIBLE = 4


@dataclass(frozen=True)
class ALOptions:
    """Outer-loop knobs (PHR multiplier method).

    penalty_init/scale/max: mu schedule (mu *= scale each outer trip until
    penalty_max). constraint_tol: max violation accepted as feasible.
    max_outer_iters: multiplier updates before giving up.
    """

    penalty_init: float = 10.0
    penalty_scale: float = 10.0
    penalty_max: float = 1e8
    constraint_tol: float = 1e-6
    max_outer_iters: int = 10


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ALSolveResult:
    trajectory: Trajectory
    cost: jax.Array  # (...) TRUE (unaugmented) cost of the returned traj
    iterations: jax.Array  # (...) int32: total inner iLQR trips
    outer_iterations: jax.Array  # (...) int32: multiplier updates executed
    max_violation: jax.Array  # (...) max_k max_j max(0, g_j(x_k, u_k, k))
    status: jax.Array  # (...) int32: STATUS_*
    multipliers: jax.Array  # (..., N, n_c) final lambda


def _eval_constraints(constraints, model, states, controls, n):
    """g for all N stages: (N, n_c). Single scenario (stacked leaves)."""

    def one(x, u, k):
        return constraints(x, u, k)

    xs = jax.tree.map(lambda leaf: leaf, states)
    return jax.vmap(one)(xs, controls, jnp.arange(n))


def _constraint_diffs(constraints, model, states, controls, n):
    """(g, jx, ju) for all N stages, Jacobians in the Lie tangent:
    jx (N, n_c, 12) = d g(x (+) tau, u)/dtau at 0, ju (N, n_c, m)."""

    def one(x, u, k):
        dtype = u.dtype
        tau0 = jnp.zeros((12,), dtype)
        du0 = jnp.zeros_like(u)

        def lifted(tau, du):
            return constraints(model.add(x, tau), u + du, k)

        g = lifted(tau0, du0)
        jx = jax.jacfwd(lifted, argnums=0)(tau0, du0)
        ju = jax.jacfwd(lifted, argnums=1)(tau0, du0)
        return g, jx, ju

    return jax.vmap(one)(states, controls, jnp.arange(n))


def _phi(g, lam, mu):
    """PHR penalty value per stage, summed over constraints: (N,) -> scalar."""
    z = jnp.maximum(lam + mu * g, 0.0)
    return jnp.sum(z * z - lam * lam) / (2.0 * mu)


def _aug_trajectory_cost(cost, traj, constraints, model, lam, mu, n):
    base = qc.trajectory_cost(cost, traj.states, traj.controls)
    g = _eval_constraints(constraints, model, traj.states, traj.controls, n)
    return base + _phi(g, lam, mu)


def _backward_pass_aug(
    params, cost, traj, dt_s, constraints, lam, mu, quu_reg, model
):
    """Riccati recursion on the augmented cost. Same return layout as
    solver.ilqr.backward_pass, but the stage carries the nonzero cost cross
    term C_xu from the penalty (see module docstring)."""
    with jax.default_matmul_precision("highest"):
        n = traj.controls.shape[-2]
        j_x, j_u, c_x, c_u, c_xx, c_uu = quadratize(
            params, cost, traj, dt_s, model
        )
        g, gx, gu = _constraint_diffs(
            constraints, model, traj.states, traj.controls, n
        )
        z = jnp.maximum(lam + mu * g, 0.0)  # (N, n_c)
        w = mu * (z > 0).astype(g.dtype)  # (N, n_c) GN weights
        c_x = c_x + jnp.einsum("ncx,nc->nx", gx, z)
        c_u = c_u + jnp.einsum("ncu,nc->nu", gu, z)
        c_xx = c_xx + jnp.einsum("ncx,nc,ncy->nxy", gx, w, gx)
        c_uu = c_uu + jnp.einsum("ncu,nc,ncv->nuv", gu, w, gu)
        c_xu = jnp.einsum("ncx,nc,ncu->nxu", gx, w, gu)

        def stage(carry, inputs):
            v_x, v_xx, qutk, ktquuk = carry
            jx, ju, cx, cu, cxx, cuu, cxu = inputs
            jxt = jnp.swapaxes(jx, -1, -2)
            jut = jnp.swapaxes(ju, -1, -2)
            vxx_ju = v_xx @ ju
            q_x = cx + jxt @ v_x
            q_u = cu + jut @ v_x
            q_xx = cxx + jxt @ (v_xx @ jx)
            q_uu = cuu + jut @ vxx_ju
            q_uu = q_uu + quu_reg * jnp.eye(q_uu.shape[-1], dtype=q_uu.dtype)
            # the penalty's nonzero cross term (module docstring): the ONLY
            # difference from the plain stage's Q-expansion
            q_xu = cxu + jxt @ vxx_ju

            k, big_k, v_x_new, v_xx_new, qutk_inc, ktquuk_inc = (
                riccati_gains_update(q_x, q_u, q_xx, q_uu, q_xu)
            )
            return (
                (v_x_new, v_xx_new, qutk + qutk_inc, ktquuk + ktquuk_inc),
                (k, big_k),
            )

        dtype = traj.controls.dtype
        init = (
            jnp.zeros((12,), dtype),
            jnp.zeros((12, 12), dtype),
            jnp.zeros((), dtype),
            jnp.zeros((), dtype),
        )
        (_, _, qutk, ktquuk), (ks, big_ks) = jax.lax.scan(
            stage, init, (j_x, j_u, c_x, c_u, c_xx, c_uu, c_xu), reverse=True
        )
        return ks, big_ks, qutk, ktquuk


def _inner_solve(
    params, cost, constraints, traj0, dt_s, lam, mu, options, model, n
):
    """iLQR on the augmented cost — exact reference loop semantics
    (ilqr.hh:53-87: trip-0 full step, pre/post convergence checks,
    backtracking line search, status instead of throw)."""
    dtype = traj0.controls.dtype
    max_iters = int(options.convergence_criteria.max_iters)
    ls = options.line_search_params

    def total_cost(traj):
        return _aug_trajectory_cost(cost, traj, constraints, model, lam, mu, n)

    def line_search(traj, current, ks, big_ks, qutk, ktquuk):
        def cond(carry):
            i, _, _, _, accepted = carry
            return jnp.logical_and(i < ls.max_iters, jnp.logical_not(accepted))

        def body(carry):
            i, step, _, _, _ = carry
            t = forward_sim(params, traj, ks, big_ks, step, dt_s, model)
            c = total_cost(t)
            desired = ls.desired_reduction_frac * expected_cost_reduction(
                qutk, ktquuk, step
            )
            return (i + 1, step * ls.step_update, t, c, (c - current) < desired)

        init = (
            jnp.asarray(0, jnp.int32),
            jnp.ones((), dtype),
            traj,
            current,
            jnp.zeros((), bool),
        )
        _, _, t, c, accepted = jax.lax.while_loop(cond, body, init)
        return t, c, accepted

    def cond(carry):
        i, _, _, done, _ = carry
        return jnp.logical_and(i < max_iters, jnp.logical_not(done))

    def body(carry):
        i, traj, new_cost, done, status = carry
        ks, big_ks, qutk, ktquuk = _backward_pass_aug(
            params, cost, traj, dt_s, constraints, lam, mu,
            options.quu_reg, model,
        )
        current = new_cost
        expected = current + expected_cost_reduction(qutk, ktquuk)
        pre_conv = jnp.logical_and(i > 0, is_converged(current, expected, options))

        def do_update(_):
            def first_iter(_):
                t = forward_sim(
                    params, traj, ks, big_ks, jnp.ones((), dtype), dt_s, model
                )
                return t, total_cost(t), jnp.ones((), bool)

            def later_iter(_):
                return line_search(traj, current, ks, big_ks, qutk, ktquuk)

            t, c, ls_ok = jax.lax.cond(i == 0, first_iter, later_iter, None)
            post_conv = jnp.logical_and(i > 0, is_converged(current, c, options))
            new_status = jnp.where(
                jnp.logical_not(ls_ok),
                STATUS_LINE_SEARCH_FAILED,
                jnp.where(post_conv, STATUS_CONVERGED, STATUS_MAX_ITERS),
            )
            return t, c, jnp.logical_or(post_conv, jnp.logical_not(ls_ok)), (
                new_status.astype(jnp.int32)
            )

        def pre_converged(_):
            return (
                traj, new_cost, jnp.ones((), bool),
                jnp.asarray(STATUS_CONVERGED, jnp.int32),
            )

        traj2, cost2, done2, status2 = jax.lax.cond(
            pre_conv, pre_converged, do_update, None
        )
        i_next = jnp.where(pre_conv, i, i + 1)
        return (i_next, traj2, cost2, done2, status2)

    init = (
        jnp.zeros((), jnp.int32),
        traj0,
        total_cost(traj0),
        jnp.zeros((), bool),
        jnp.asarray(STATUS_MAX_ITERS, jnp.int32),
    )
    i, traj, c, _, status = jax.lax.while_loop(cond, body, init)
    return traj, c, i, status


@partial(
    jax.jit,
    static_argnames=(
        "constraints", "dt_s", "options", "al_options", "model", "robust",
        "fddp_options",
    ),
)
def solve_auglag(
    params,
    cost,
    constraints,
    initial_traj: Trajectory,
    dt_s: float,
    options: ILQROptions = ILQROptions(),
    al_options: ALOptions = ALOptions(),
    model=None,
    robust: bool = False,
    fddp_options=None,
) -> ALSolveResult:
    """Constrained iLQR solve for ONE scenario (vmap for batches).

    `constraints(x: State, u, k) -> (n_c,)` is a single-stage inequality
    vector, FEASIBLE when <= 0 (see solver/constraints.py for ready-made
    builders and composition). Runs the PHR multiplier loop of the module
    docstring; returns the TRUE (unaugmented) cost and the worst remaining
    violation. With constraints that never activate this reduces to the
    unconstrained `solve` trajectory (tested).

    `robust=True` (round 5) swaps the inner solver for the
    multiple-shooting FDDP loop on the AUGMENTED problem
    (solver/fddp.solve_fddp penalty_fns: the PHR value folds into every
    line-search candidate, the PHR quadratics — incl. the C_xu cross
    term — into the gap-transported backward pass). This is ROBUST
    CONSTRAINED FLIGHT: on the aggressive-tumble class the exact inner
    loop's unconditional iteration-0 rollout diverges (the measured ~2%%
    f32 NaN tail — BENCH_LOCAL round 5); the FDDP inner loop's gap
    contraction + Goldstein acceptance + adaptive mu rescue it. With a
    benign start both solvers settle the same KKT points.
    `fddp_options` (static FDDPOptions) tunes the robust inner loop.
    """
    model = qm if model is None else model
    dtype = initial_traj.controls.dtype
    n = initial_traj.controls.shape[-2]
    n_c = jax.eval_shape(
        constraints,
        jax.tree.map(lambda leaf: leaf[..., 0, :], initial_traj.states),
        initial_traj.controls[..., 0, :],
        jnp.zeros((), jnp.int32),
    ).shape[-1]
    alo = al_options
    ctol = jnp.asarray(alo.constraint_tol, dtype)

    if robust:
        from .fddp import FDDPOptions, solve_fddp

        fo_inner = FDDPOptions() if fddp_options is None else fddp_options

        def _pen_value(states, controls, args):
            lam, mu = args
            g = _eval_constraints(constraints, model, states, controls, n)
            z = jnp.maximum(lam + mu * g, 0.0)
            return jnp.sum(z * z - lam * lam, axis=-1) / (2.0 * mu)

        def _pen_quads(traj, args):
            lam, mu = args
            g, gx, gu = _constraint_diffs(
                constraints, model, traj.states, traj.controls, n
            )
            z = jnp.maximum(lam + mu * g, 0.0)
            w = mu * (z > 0).astype(g.dtype)
            pcx = jnp.einsum("ncx,nc->nx", gx, z)
            pcu = jnp.einsum("ncu,nc->nu", gu, z)
            pcxx = jnp.einsum("ncx,nc,ncy->nxy", gx, w, gx)
            pcuu = jnp.einsum("ncu,nc,ncv->nuv", gu, w, gu)
            pcxu = jnp.einsum("ncx,nc,ncu->nxu", gx, w, gu)
            return pcx, pcu, pcxx, pcuu, pcxu

        def robust_inner(traj, lam, mu):
            rs = solve_fddp(
                params, cost, traj, dt_s, options, fo_inner, model=model,
                penalty_fns=(_pen_value, _pen_quads),
                penalty_args=(lam, mu),
            )
            return rs.trajectory, rs.cost, rs.iterations, rs.status

    def violation(traj):
        g = _eval_constraints(
            constraints, model, traj.states, traj.controls, n
        )
        return jnp.max(jnp.maximum(g, 0.0)), g

    def cond(carry):
        outer, _, _, _, _, _, done, _ = carry
        return jnp.logical_and(outer < alo.max_outer_iters, jnp.logical_not(done))

    def body(carry):
        outer, traj, lam, mu, _, total_inner, _, _ = carry
        if robust:
            traj2, _, inner_i, inner_status = robust_inner(traj, lam, mu)
        else:
            traj2, _, inner_i, inner_status = _inner_solve(
                params, cost, constraints, traj, dt_s, lam, mu, options,
                model, n,
            )
        viol, g = violation(traj2)
        lam_new = jnp.maximum(lam + mu * g, 0.0)
        feasible = viol < ctol
        mu_new = jnp.where(
            feasible, mu, jnp.minimum(mu * alo.penalty_scale, alo.penalty_max)
        )
        status = jnp.where(
            feasible,
            jnp.where(
                inner_status == STATUS_CONVERGED,
                STATUS_CONVERGED,
                STATUS_FEASIBLE_MAX_ITERS,
            ),
            STATUS_INFEASIBLE,
        ).astype(jnp.int32)
        return (
            outer + 1, traj2, lam_new, mu_new, viol,
            total_inner + inner_i,
            jnp.logical_and(feasible, inner_status == STATUS_CONVERGED),
            status,
        )

    init = (
        jnp.zeros((), jnp.int32),
        initial_traj,
        jnp.zeros((n, n_c), dtype),
        jnp.asarray(alo.penalty_init, dtype),
        jnp.asarray(jnp.inf, dtype),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), bool),
        jnp.asarray(STATUS_INFEASIBLE, jnp.int32),
    )
    outer, traj, lam, _, viol, total_inner, _, status = jax.lax.while_loop(
        cond, body, init
    )
    return ALSolveResult(
        trajectory=traj,
        cost=qc.trajectory_cost(cost, traj.states, traj.controls),
        iterations=total_inner,
        outer_iterations=outer,
        max_violation=viol,
        status=status,
        multipliers=lam,
    )


@partial(
    jax.jit,
    static_argnames=(
        "constraints", "dt_s", "options", "al_options", "model", "interpret",
        "supertile", "robust", "fddp_options",
    ),
)
def solve_auglag_batch(
    params,
    cost,
    constraints,
    initial_trajs: Trajectory,
    dt_s: float,
    options: ILQROptions = ILQROptions(),
    al_options: ALOptions = ALOptions(),
    model=None,
    interpret: bool = False,
    supertile: bool = False,
    robust: bool = False,
    fddp_options=None,
) -> ALSolveResult:
    """Batched constrained solve at KERNEL speed (VERDICT r2 #8): the AL
    inner loop's backward passes run on the fused Pallas engine with the
    quadratized PHR penalty — including the nonzero C_xu cross term — as
    streamed per-stage operands (kernels/backward.backward_pass_fused
    penalty=...; the shared Riccati stage carries Q_xu = C_xu + JᵀVJu),
    and the line-search rollouts on the fused rollout kernel (the
    penalty value of each candidate is the cheap part — one vmapped
    constraint evaluation — added outside the kernel).

    Per-lane semantics mirror vmap(solve_auglag) exactly: the same inner
    loop (trip-0 forced step, pre/post checks, per-lane backtracking on
    the AUGMENTED cost) and the same PHR outer loop (per-lane multiplier
    updates, mu schedule, feasibility statuses), with finished lanes
    frozen. initial_trajs leaves are (B, N, ...); batches pad to the
    128-lane kernel tile.

    `supertile=True` runs the backward + rollout kernels in the
    dense-register (r, c, 8, 128) layout (kernels/backward.py SUPER_TILE
    — the round-5 layout, threaded through the per-pass kernels so the
    CONSTRAINED path rides it too, VERDICT r4 #7); pads to 1024-lane
    supertiles, VMEM-guard demotion as in solve_batch_latency.

    `robust=True` routes to vmap(solve_auglag(robust=True)) — the FDDP
    inner loop on the augmented problem (XLA path; the correctness
    configuration for constrained flight on diverging scenario classes —
    see solve_auglag). The kernel-speed batch driver keeps the exact
    inner loop."""
    from ..kernels.backward import backward_pass_fused
    from ..kernels.rollout import rollout_cost_fused

    model_m = qm if model is None else model
    if robust:
        params_batched = jnp.ndim(params.mass_kg) >= 1
        cost_axes = jax.tree.map(
            lambda batched: 0 if batched else None,
            qc.cost_batched_flags(cost),
        )
        return jax.vmap(
            lambda p, c, t: solve_auglag(
                p, c, constraints, t, dt_s, options, al_options,
                model=model, robust=True, fddp_options=fddp_options,
            ),
            in_axes=(
                jax.tree.map(lambda _: 0, params)
                if params_batched
                else jax.tree.map(lambda _: None, params),
                cost_axes,
                0,
            ),
        )(params, cost, initial_trajs)
    batch = initial_trajs.controls.shape[0]
    n = initial_trajs.controls.shape[-2]
    dtype = initial_trajs.controls.dtype
    if supertile:
        from ..kernels.models import lane_model_for
        from .batched import _supertile_horizon_budget

        try:
            u_dim = lane_model_for(params, model).u_dim
        except TypeError:
            u_dim = None
        # rows_base=48 + the five streamed penalty operand rows (~25/stage
        # at u=4) — stay conservative and reuse the stricter FDDP base
        if u_dim is None or n > _supertile_horizon_budget(
            cost, params, u_dim, rows_base=60
        ):
            supertile = False
    pad = (-batch) % (1024 if supertile else 128)
    if pad:
        def pad_lane(a):
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[0:1], (pad,) + a.shape[1:])], axis=0
            )

        params_batched = jnp.ndim(params.mass_kg) >= 1
        padded = solve_auglag_batch(
            jax.tree.map(pad_lane, params) if params_batched else params,
            jax.tree.map(
                lambda a, batched: pad_lane(a) if batched else a,
                cost,
                qc.cost_batched_flags(cost),
            ),
            constraints,
            jax.tree.map(pad_lane, initial_trajs),
            dt_s,
            options,
            al_options=al_options,
            model=model,
            interpret=interpret,
            supertile=supertile,
        )
        return jax.tree.map(lambda a: a[:batch], padded)

    n_c = jax.eval_shape(
        constraints,
        jax.tree.map(lambda leaf: leaf[0, 0, :], initial_trajs.states),
        initial_trajs.controls[0, 0, :],
        jnp.zeros((), jnp.int32),
    ).shape[-1]
    alo = al_options
    ctol = jnp.asarray(alo.constraint_tol, dtype)
    max_iters = int(options.convergence_criteria.max_iters)
    ls = options.line_search_params
    cost_axes = jax.tree.map(
        lambda batched: 0 if batched else None, qc.cost_batched_flags(cost)
    )

    def base_cost(trajs):
        return jax.vmap(
            lambda c, t: qc.trajectory_cost(c, t.states, t.controls),
            in_axes=(cost_axes, 0),
        )(cost, trajs)

    def constraint_vals(trajs):
        return jax.vmap(
            lambda t: _eval_constraints(
                constraints, model_m, t.states, t.controls, n
            )
        )(trajs)  # (B, N, n_c)

    def aug_cost(trajs, lam, mu):
        g = constraint_vals(trajs)
        return base_cost(trajs) + jax.vmap(_phi)(g, lam, mu)

    def penalty_quads(trajs, lam, mu):
        """Per-stage PHR quadratics ((B, N, ...), the exact math of
        _backward_pass_aug) as kernel operands."""
        g, gx, gu = jax.vmap(
            lambda t: _constraint_diffs(
                constraints, model_m, t.states, t.controls, n
            )
        )(trajs)
        z = jnp.maximum(lam + mu[:, None, None] * g, 0.0)
        wgt = mu[:, None, None] * (z > 0).astype(dtype)
        pcx = jnp.einsum("bncx,bnc->bnx", gx, z)
        pcu = jnp.einsum("bncu,bnc->bnu", gu, z)
        pcxx = jnp.einsum("bncx,bnc,bncy->bnxy", gx, wgt, gx)
        pcuu = jnp.einsum("bncu,bnc,bncv->bnuv", gu, wgt, gu)
        pcxu = jnp.einsum("bncx,bnc,bncu->bnxu", gx, wgt, gu)
        return pcx, pcu, pcxx, pcuu, pcxu

    def inner_solve(trajs, lam, mu, outer_active):
        """Batched mirror of _inner_solve on the kernel engines; lanes
        outside `outer_active` freeze (their outputs are re-selected)."""

        def line_search(traj, current, ks, big_ks, qutk, ktquuk, active):
            def cond(carry):
                j, _, accepted, _, _ = carry
                return jnp.logical_and(
                    j < ls.max_iters,
                    jnp.any(jnp.logical_and(active, ~accepted)),
                )

            def body(carry):
                j, alpha, accepted, best, best_cost = carry
                pending = jnp.logical_and(active, ~accepted)
                cand, _ = rollout_cost_fused(
                    params, cost, traj, ks, big_ks, alpha, dt_s,
                    interpret=interpret, model=model, supertile=supertile,
                )
                cand_cost = aug_cost(cand, lam, mu)
                desired = ls.desired_reduction_frac * expected_cost_reduction(
                    qutk, ktquuk, alpha
                )
                ok = (cand_cost - current) < desired
                best = _where_lanes_al(pending, cand, best)
                best_cost = jnp.where(pending, cand_cost, best_cost)
                accepted = jnp.logical_or(
                    accepted, jnp.logical_and(pending, ok)
                )
                alpha = jnp.where(
                    jnp.logical_or(accepted, ~active),
                    alpha,
                    alpha * ls.step_update,
                )
                return (j + 1, alpha, accepted, best, best_cost)

            init = (
                jnp.zeros((), jnp.int32),
                jnp.ones((batch,), dtype),
                jnp.zeros((batch,), bool),
                traj,
                current,
            )
            _, _, accepted, best, best_cost = jax.lax.while_loop(
                cond, body, init
            )
            return best, best_cost, accepted

        def cond(carry):
            i, _, _, done, _, _ = carry
            return jnp.logical_and(
                i < max_iters, jnp.logical_not(jnp.all(done))
            )

        def body(carry):
            i, traj, new_cost, done, status, iters = carry
            pen = penalty_quads(traj, lam, mu)
            ks, big_ks, qutk, ktquuk = backward_pass_fused(
                params, cost, traj, dt_s, quu_reg=options.quu_reg,
                interpret=interpret, model=model, penalty=pen,
                supertile=supertile,
            )
            current = new_cost
            expected = current + expected_cost_reduction(qutk, ktquuk)
            pre_conv = jnp.logical_and(
                jnp.logical_and(i > 0, is_converged(current, expected, options)),
                jnp.logical_not(done),
            )
            active = jnp.logical_not(jnp.logical_or(done, pre_conv))

            def first_trip(_):
                cand, _ = rollout_cost_fused(
                    params, cost, traj, ks, big_ks,
                    jnp.ones((batch,), dtype), dt_s,
                    interpret=interpret, model=model, supertile=supertile,
                )
                return cand, aug_cost(cand, lam, mu), jnp.ones((batch,), bool)

            def later_trip(_):
                return line_search(
                    traj, current, ks, big_ks, qutk, ktquuk, active
                )

            cand, cand_cost, ls_ok = jax.lax.cond(
                i == 0, first_trip, later_trip, None
            )
            post_conv = jnp.logical_and(
                jnp.logical_and(i > 0, is_converged(current, cand_cost, options)),
                jnp.logical_and(active, ls_ok),
            )
            ls_failed = jnp.logical_and(active, jnp.logical_not(ls_ok))
            traj = _where_lanes_al(active, cand, traj)
            new_cost = jnp.where(active, cand_cost, current)
            status = jnp.where(
                ls_failed,
                STATUS_LINE_SEARCH_FAILED,
                jnp.where(
                    jnp.logical_or(post_conv, pre_conv),
                    STATUS_CONVERGED,
                    status,
                ),
            ).astype(jnp.int32)
            done = jnp.logical_or(
                done,
                jnp.logical_or(pre_conv, jnp.logical_or(post_conv, ls_failed)),
            )
            iters = iters + jnp.where(active, 1, 0).astype(jnp.int32)
            return (i + 1, traj, new_cost, done, status, iters)

        init = (
            jnp.zeros((), jnp.int32),
            trajs,
            aug_cost(trajs, lam, mu),
            jnp.logical_not(outer_active),  # frozen lanes never update
            jnp.full((batch,), STATUS_MAX_ITERS, jnp.int32),
            jnp.zeros((batch,), jnp.int32),
        )
        _, traj, c, _, status, iters = jax.lax.while_loop(cond, body, init)
        return traj, c, iters, status

    def outer_cond(carry):
        outer, _, _, _, _, _, done, _, _ = carry
        return jnp.logical_and(
            outer < alo.max_outer_iters, jnp.logical_not(jnp.all(done))
        )

    def outer_body(carry):
        outer, traj, lam, mu, viol, total_inner, done, status, outer_i = carry
        open_ = jnp.logical_not(done)
        traj2, _, inner_i, inner_status = inner_solve(traj, lam, mu, open_)
        g = constraint_vals(traj2)
        viol2 = jnp.max(
            jnp.maximum(g, 0.0).reshape(batch, -1), axis=1
        )
        lam_new = jnp.maximum(lam + mu[:, None, None] * g, 0.0)
        feasible = viol2 < ctol
        mu_new = jnp.where(
            feasible, mu, jnp.minimum(mu * alo.penalty_scale, alo.penalty_max)
        )
        status_new = jnp.where(
            feasible,
            jnp.where(
                inner_status == STATUS_CONVERGED,
                STATUS_CONVERGED,
                STATUS_FEASIBLE_MAX_ITERS,
            ),
            STATUS_INFEASIBLE,
        ).astype(jnp.int32)
        # frozen lanes keep everything
        traj3 = _where_lanes_al(open_, traj2, traj)
        return (
            outer + 1,
            traj3,
            jnp.where(open_[:, None, None], lam_new, lam),
            jnp.where(open_, mu_new, mu),
            jnp.where(open_, viol2, viol),
            total_inner + jnp.where(open_, inner_i, 0),
            jnp.logical_or(
                done,
                jnp.logical_and(feasible, inner_status == STATUS_CONVERGED),
            ),
            jnp.where(open_, status_new, status),
            outer_i + jnp.where(open_, 1, 0).astype(jnp.int32),
        )

    init = (
        jnp.zeros((), jnp.int32),
        initial_trajs,
        jnp.zeros((batch, n, n_c), dtype),
        jnp.full((batch,), alo.penalty_init, dtype),
        jnp.full((batch,), jnp.inf, dtype),
        jnp.zeros((batch,), jnp.int32),
        jnp.zeros((batch,), bool),
        jnp.full((batch,), STATUS_INFEASIBLE, jnp.int32),
        jnp.zeros((batch,), jnp.int32),
    )
    (
        outer, traj, lam, _, viol, total_inner, _, status, outer_i
    ) = jax.lax.while_loop(outer_cond, outer_body, init)
    return ALSolveResult(
        trajectory=traj,
        cost=base_cost(traj),
        iterations=total_inner,
        outer_iterations=outer_i,
        max_violation=viol,
        status=status,
        multipliers=lam,
    )


def _where_lanes_al(mask, a, b):
    """Per-lane select over (B, ...) pytrees; mask is (B,)."""
    return jax.tree.map(
        lambda x, y: jnp.where(
            mask.reshape(mask.shape + (1,) * (x.ndim - 1)), x, y
        ),
        a,
        b,
    )
