"""Control-limited iLQR: box constraints lo <= u <= hi (opt-in extension).

The reference solver is unconstrained (ilqr.hh has no notion of control
limits); real rotors saturate. This module adds the standard
control-limited DDP treatment (cf. PAPERS.md: Tassa, Mansard & Todorov,
"Control-Limited Differential Dynamic Programming", ICRA 2014 — re-derived
here, no code shared), kept SEPARATE from solver/ilqr.py so the
reference-parity paths stay byte-identical:

  * backward pass: the per-stage gain solve becomes a box-QP
        min_δu  ½ δuᵀ Quu δu + Quᵀ δu   s.t.  lo − u ≤ δu ≤ hi − u
    solved by PROJECTED NEWTON with a fixed iteration count (active set
    settles in <= m iterations for m = 4..6 controls; every iteration is a
    masked small-Cholesky solve that unrolls to straight-line code inside
    the scan body — no data-dependent control flow). Feedback rows of K
    are zeroed for clamped dimensions (they must not push through the
    bound);
  * forward rollout: u = clip(u_old + α k + K (x ⊖ x_old), lo, hi);
  * outer loop / line search / convergence: the exact reference semantics
    (trip-0 full step, pre/post checks, backtracking, status codes).

Everything is pure JAX (scan + masked unrolled Cholesky), jits, vmaps over
scenarios, and is model-generic via the same `model=` protocol as `solve`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..costs import quadratic as qc
from ..models import quadrotor as qm
from ..ops.linalg import chol_solve_small, chol_solve_vec
from .ilqr import (
    STATUS_CONVERGED,
    STATUS_LINE_SEARCH_FAILED,
    STATUS_MAX_ITERS,
    SolveResult,
    Trajectory,
    expected_cost_reduction,
    is_converged,
    quadratize,
)
from .options import ILQROptions

# Projected-Newton iterations per stage. The active set of an m-dim box-QP
# changes at most m times along the Newton path; 4 covers both model
# families (m = 4, 6) in practice — each extra iteration is one more
# unrolled m x m Cholesky in the scan body.
_PN_ITERS = 4


def _boxqp_gains(q_uu, q_u, q_ux, lo_d, hi_d):
    """Projected-Newton box-QP for one stage (batched over leading dims).

    Returns (k, big_k): the clamped feedforward step and the feedback
    matrix with zeroed rows for clamped dimensions.
    """
    dtype = q_u.dtype
    eps = jnp.asarray(1e-9 if dtype == jnp.float64 else 1e-6, dtype)

    # init: unconstrained Newton step, clipped into the box
    delta = jnp.clip(-chol_solve_vec(q_uu, q_u), lo_d, hi_d)

    def newton(carry, _):
        delta, _ = carry
        grad = q_u + jnp.einsum("...ij,...j->...i", q_uu, delta)
        clamped = jnp.logical_or(
            jnp.logical_and(delta <= lo_d + eps, grad > 0),
            jnp.logical_and(delta >= hi_d - eps, grad < 0),
        )
        free = jnp.logical_not(clamped).astype(dtype)
        # masked SPD system: A = Quu on the free block, identity elsewhere
        a = (
            q_uu * free[..., :, None] * free[..., None, :]
            + _diag(1.0 - free)
        )
        rhs = q_u + jnp.einsum(
            "...ij,...j->...i", q_uu, delta * (1.0 - free)
        )
        step = -chol_solve_vec(a, rhs * free)  # clamped rows solve to 0
        cand = step + delta * (1.0 - free)
        return (jnp.clip(cand, lo_d, hi_d), free), None

    (delta, free), _ = jax.lax.scan(
        newton, (delta, jnp.ones_like(delta)), None, length=_PN_ITERS
    )

    # feedback on the final free set only: K = -A⁻¹ Q_ux (clamped rows 0)
    a = q_uu * free[..., :, None] * free[..., None, :] + _diag(1.0 - free)
    big_k = -chol_solve_small(a, q_ux * free[..., :, None])
    return delta, big_k


def _diag(v):
    """Batched diag embed: (..., m) -> (..., m, m)."""
    m = v.shape[-1]
    return v[..., :, None] * jnp.eye(m, dtype=v.dtype)


def backward_pass_box(
    params, cost, traj, dt_s, lo, hi, quu_reg=0.0, model=qm
):
    """Riccati recursion with per-stage box-QP gains (module docstring).
    Same return layout as solver.ilqr.backward_pass."""
    with jax.default_matmul_precision("highest"):
        return _backward_pass_box_hp(
            params, cost, traj, dt_s, lo, hi, quu_reg, model
        )


def _backward_pass_box_hp(params, cost, traj, dt_s, lo, hi, quu_reg, model):
    j_x, j_u, c_x, c_u, c_xx, c_uu = quadratize(params, cost, traj, dt_s, model)
    n_axis = traj.controls.ndim - 2
    u_now = jnp.moveaxis(traj.controls, n_axis, 0)

    def stage(carry, inputs):
        v_x, v_xx, qutk, ktquuk = carry
        jx, ju, cx, cu, cxx, cuu, u = inputs
        jxt = jnp.swapaxes(jx, -1, -2)
        jut = jnp.swapaxes(ju, -1, -2)
        vxx_jx = v_xx @ jx
        vxx_ju = v_xx @ ju
        q_x = cx + jnp.einsum("...ij,...j->...i", jxt, v_x)
        q_u = cu + jnp.einsum("...ij,...j->...i", jut, v_x)
        q_xx = cxx + jxt @ vxx_jx
        q_uu = cuu + jut @ vxx_ju
        if quu_reg:
            q_uu = q_uu + quu_reg * jnp.eye(q_uu.shape[-1], dtype=q_uu.dtype)
        q_xu = jxt @ vxx_ju
        q_ux = jnp.swapaxes(q_xu, -1, -2)

        k, big_k = _boxqp_gains(q_uu, q_u, q_ux, lo - u, hi - u)

        quu_k = jnp.einsum("...ij,...j->...i", q_uu, k)
        big_kt = jnp.swapaxes(big_k, -1, -2)
        # value update with the constrained gains (clamped rows of K are
        # zero, so the update only propagates curvature of free directions)
        v_x_new = (
            q_x
            + jnp.einsum("...ij,...j->...i", big_kt, quu_k)
            + jnp.einsum("...ij,...j->...i", big_kt, q_u)
            + jnp.einsum("...ij,...j->...i", q_xu, k)
        )
        s = q_xx + q_xu @ big_k + big_kt @ q_ux + big_kt @ q_uu @ big_k
        v_xx_new = 0.5 * (s + jnp.swapaxes(s, -1, -2))
        qutk = qutk + jnp.einsum("...i,...i->...", q_u, k)
        ktquuk = ktquuk + jnp.einsum("...i,...i->...", k, quu_k)
        return (v_x_new, v_xx_new, qutk, ktquuk), (k, big_k)

    batch = traj.controls.shape[:-2]
    dtype = traj.controls.dtype
    init = (
        jnp.zeros(batch + (12,), dtype),
        jnp.zeros(batch + (12, 12), dtype),
        jnp.zeros(batch, dtype),
        jnp.zeros(batch, dtype),
    )
    xs = jax.tree.map(
        lambda a: jnp.moveaxis(a, n_axis, 0),
        (j_x, j_u, c_x, c_u, c_xx, c_uu),
    ) + (u_now,)
    (_, _, qutk, ktquuk), (ks, big_ks) = jax.lax.scan(
        stage, init, xs, reverse=True
    )
    return (
        jnp.moveaxis(ks, 0, n_axis),
        jnp.moveaxis(big_ks, 0, n_axis),
        qutk,
        ktquuk,
    )


def forward_sim_box(params, traj, ks, big_ks, alpha, dt_s, lo, hi, model=qm):
    """Clamped closed-loop rollout: u = clip(u_old + αk + K dx, lo, hi)."""
    with jax.default_matmul_precision("highest"):
        x0 = jax.tree.map(lambda leaf: leaf[..., 0, :], traj.states)
        n_axis = traj.controls.ndim - 2

        def to_front(a):
            return jnp.moveaxis(a, n_axis, 0)

        xs = (
            jax.tree.map(to_front, traj.states),
            to_front(traj.controls),
            to_front(ks),
            to_front(big_ks),
        )

        def stage(state, inputs):
            x_old, u_old, k, big_k = inputs
            dx = model.minus(state, x_old)
            u = u_old + alpha[..., None] * k + jnp.einsum(
                "...ij,...j->...i", big_k, dx
            )
            u = jnp.clip(u, lo, hi)
            return model.discrete_dynamics(params, state, u, dt_s), (state, u)

        _, (states, controls) = jax.lax.scan(stage, x0, xs)
        return Trajectory(
            times=traj.times,
            states=jax.tree.map(
                lambda leaf: jnp.moveaxis(leaf, 0, n_axis), states
            ),
            controls=jnp.moveaxis(controls, 0, n_axis),
        )


@partial(jax.jit, static_argnames=("options", "dt_s", "model"))
def solve_box(
    params,
    cost,
    initial_traj: Trajectory,
    dt_s: float,
    lo,
    hi,
    options: ILQROptions = ILQROptions(),
    model=None,
) -> SolveResult:
    """Control-limited iLQR solve for ONE scenario (vmap for batches).

    `lo`/`hi` are (m,) control bounds (broadcastable against controls).
    Loop semantics mirror solver.ilqr.solve exactly (trip-0 full step,
    pre/post convergence checks, backtracking line search, per-scenario
    status); only the stage gain solve (box-QP) and the rollout (clamping)
    differ. With infinite bounds this reduces to the unconstrained solve.
    """
    model = qm if model is None else model
    dtype = initial_traj.controls.dtype
    lo = jnp.asarray(lo, dtype)
    hi = jnp.asarray(hi, dtype)
    max_iters = int(options.convergence_criteria.max_iters)
    new_cost0 = qc.trajectory_cost(
        cost, initial_traj.states, initial_traj.controls
    )
    ls = options.line_search_params

    def rollout_cost(traj, ks, big_ks, alpha):
        t = forward_sim_box(
            params, traj, ks, big_ks, alpha, dt_s, lo, hi, model
        )
        return t, qc.trajectory_cost(cost, t.states, t.controls)

    def line_search(traj, current, ks, big_ks, qutk, ktquuk):
        one = jnp.asarray(1.0, dtype)

        def cond(carry):
            i, _, _, _, accepted = carry
            return jnp.logical_and(
                i < ls.max_iters, jnp.logical_not(accepted)
            )

        def body(carry):
            i, step, _, _, _ = carry
            t, c = rollout_cost(traj, ks, big_ks, step)
            desired = ls.desired_reduction_frac * expected_cost_reduction(
                qutk, ktquuk, step
            )
            accept = (c - current) < desired
            return (i + 1, step * ls.step_update, t, c, accept)

        init = (
            jnp.asarray(0, jnp.int32),
            jnp.broadcast_to(one, current.shape),
            traj,
            current,
            jnp.zeros(current.shape, bool),
        )
        _, _, t, c, accepted = jax.lax.while_loop(cond, body, init)
        return t, c, accepted

    def cond(carry):
        i, _, _, done, _ = carry
        return jnp.logical_and(i < max_iters, jnp.logical_not(done))

    def body(carry):
        i, traj, new_cost, done, status = carry
        ks, big_ks, qutk, ktquuk = backward_pass_box(
            params, cost, traj, dt_s, lo, hi, options.quu_reg, model
        )
        current = new_cost
        expected = current + expected_cost_reduction(qutk, ktquuk)
        pre_conv = jnp.logical_and(
            i > 0, is_converged(current, expected, options)
        )

        def do_update(_):
            def first_iter(_):
                t, c = rollout_cost(
                    traj, ks, big_ks, jnp.asarray(1.0, dtype)
                )
                return t, c, jnp.ones((), bool)

            def later_iter(_):
                return line_search(traj, current, ks, big_ks, qutk, ktquuk)

            t, c, ls_ok = jax.lax.cond(i == 0, first_iter, later_iter, None)
            post_conv = jnp.logical_and(
                i > 0, is_converged(current, c, options)
            )
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
                traj,
                new_cost,
                jnp.ones((), bool),
                jnp.asarray(STATUS_CONVERGED, jnp.int32),
            )

        traj2, cost2, done2, status2 = jax.lax.cond(
            pre_conv, pre_converged, do_update, None
        )
        i_next = jnp.where(pre_conv, i, i + 1)
        return (i_next, traj2, cost2, done2, status2)

    init = (
        jnp.zeros((), jnp.int32),
        initial_traj,
        new_cost0,
        jnp.zeros((), bool),
        jnp.asarray(STATUS_MAX_ITERS, jnp.int32),
    )
    i, traj, final_cost, done, status = jax.lax.while_loop(cond, body, init)
    return SolveResult(
        trajectory=traj,
        cost=final_cost,
        iterations=i,
        status=status,
        debug=None,
    )
