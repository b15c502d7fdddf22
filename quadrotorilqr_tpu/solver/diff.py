"""Differentiable trajectory optimization: gradients THROUGH the solve.

The reference solver is a C++ black box; its solution cannot be
differentiated. Here `solve_implicit` is a `jax.custom_vjp` wrapper around
the regular solve (solver/ilqr.py) that makes the SOLUTION differentiable
w.r.t. every problem input — cost weights Q/R, desired trajectory,
physical params, and the initial state — enabling gradient-based cost
tuning, system identification, and learning pipelines that backpropagate
through an optimal controller (cf. PAPERS.md: Amos et al., "Differentiable
MPC for End-to-end Planning and Control", NeurIPS 2018 — re-derived here
for the Lie-group shooting formulation; no code shared).

Math. iLQR is a shooting method: the solution controls U* satisfy the
stationarity condition g(U*, θ) := ∇_U J(U*, θ) = 0, where

    J(U, θ) = Σ_i (x_i ⊖ x_d_i)' Q (x_i ⊖ x_d_i) + (u_i − u_d_i)' R (u_i − u_d_i)
    x_0 fixed,  x_{i+1} = f(x_i, u_i)               (the true rollout)

and θ = (params, cost, x_0). By the implicit function theorem,

    dU*/dθ = −H^{-1} ∇²_{Uθ} J,     H = ∇²_{UU} J (exact shooting Hessian).

Reverse mode with incoming cotangents (x̄ on states, ū on controls, c̄ on
the cost value):

  * states are X(U*, θ) (the rollout): pull x̄ back through X onto U and θ
    (one VJP of the rollout);
  * the effective control cotangent Ū solves H λ = Ū — conjugate
    gradients with EXACT Hessian-vector products (forward-over-reverse
    through the rollout; H is PD at a strict minimum, and CG needs no
    materialized H);
  * θ̄ += −∂/∂θ [λ' ∇_U J(U*, θ)]  (one grad-of-JVP), evaluated at U*;
  * the cost output obeys the envelope theorem: ∇_θ J(U*(θ), θ) = ∇_θ J
    at fixed U* (the ∇_U J · dU*/dθ term vanishes at stationarity), so c̄
    contributes c̄ · ∇_θ J directly — no linear solve needed.

Validity: gradients are exact AT a stationary point — solve to tight
tolerance (status == converged) before trusting them; looser tolerance
degrades gradient accuracy in proportion to the residual ‖∇_U J‖.

Everything is pure JAX (scan/vjp/jvp/CG), so it jits, vmaps over scenario
batches, and runs on TPU; `model=` selects the model family exactly as in
the solver layer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..costs import quadratic as qc
from . import ilqr as ilqr_module
from .ilqr import SolveResult, Trajectory
from .options import ILQROptions


def _rollout_states(u, x0, params, dt_s, model):
    """States x_0..x_{N-1} of the shooting rollout (ilqr.hh:157-169: the
    last control only enters the cost, never a dynamics step)."""

    def step(x, un):
        xn = model.discrete_dynamics(params, x, un, dt_s)
        return xn, xn

    _, xs = jax.lax.scan(step, x0, u[:-1])  # [x_1 ... x_{N-1}]
    return jax.tree.map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
        x0,
        xs,
    )


def _objective(u, params, cost, x0, dt_s, model):
    states = _rollout_states(u, x0, params, dt_s, model)
    return qc.trajectory_cost(cost, states, u), states


def _cg_solve(hvp, b, iters, tol):
    """Plain conjugate gradients on the PD shooting Hessian (matrix-free)."""

    def body(carry):
        x, r, p, rs, k = carry
        hp = hvp(p)
        alpha = rs / jnp.vdot(p, hp)
        x = x + alpha * p
        r = r - alpha * hp
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / rs) * p
        return (x, r, p, rs_new, k + 1)

    def cond(carry):
        _, _, _, rs, k = carry
        return jnp.logical_and(k < iters, rs > tol * tol)

    x0 = jnp.zeros_like(b)
    rs0 = jnp.vdot(b, b)
    out = jax.lax.while_loop(cond, body, (x0, b, b, rs0, 0))
    return out[0]


@partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7),
)
def solve_implicit(
    params,
    cost,
    initial_traj: Trajectory,
    dt_s: float,
    options: ILQROptions = ILQROptions(),
    model=None,
    cg_iters: int = 50,
    cg_tol: float = 1e-10,
) -> SolveResult:
    """`solve` with implicit-function-theorem gradients (module docstring).

    Differentiable inputs: params, cost (Q, R, desired states/controls),
    and the initial STATE (initial_traj.states index 0; the rest of the
    initialization does not influence a converged solution and receives
    zero cotangent). Differentiable outputs: trajectory states/controls
    and the cost value. `debug` must stay disabled.
    """
    return ilqr_module.solve(
        params, cost, initial_traj, dt_s, options, model=model
    )


def _solve_implicit_fwd(
    params, cost, initial_traj, dt_s, options, model, cg_iters, cg_tol
):
    res = ilqr_module.solve(
        params, cost, initial_traj, dt_s, options, model=model
    )
    return res, (params, cost, initial_traj, res)


def _solve_implicit_bwd(
    dt_s, options, model, cg_iters, cg_tol, residuals, cot
):
    if model is None:
        from ..models import quadrotor as model  # noqa: PLW0127

    params, cost, initial_traj, res = residuals
    u_star = res.trajectory.controls  # (N, u)
    x0 = jax.tree.map(lambda a: a[0], res.trajectory.states)
    n, u_dim = u_star.shape

    def objective(u, p, c, x):
        return _objective(u, p, c, x, dt_s, model)[0]

    def states_of(u, p, x):
        return _rollout_states(u, x, p, dt_s, model)

    # ---- pull state cotangents back through the rollout -------------------
    x_bar = cot.trajectory.states
    _, rollout_vjp = jax.vjp(states_of, u_star, params, x0)
    u_from_x, params_from_x, x0_from_x = rollout_vjp(x_bar)

    u_bar_eff = cot.trajectory.controls + u_from_x

    # ---- IFT term: λ = H^{-1} Ū, then θ̄ = −∂_θ (λ' ∇_U J) ---------------
    grad_u = jax.grad(objective, argnums=0)

    def hvp(v_flat):
        v = v_flat.reshape(n, u_dim)
        return jax.jvp(
            lambda u: grad_u(u, params, cost, x0), (u_star,), (v,)
        )[1].reshape(-1)

    lam = _cg_solve(hvp, u_bar_eff.reshape(-1), cg_iters, cg_tol).reshape(
        n, u_dim
    )

    def mixed(p, c, x):
        # λ' ∇_U J(U*, θ) as a JVP of the gradient in direction λ — its
        # θ-gradient is the mixed second derivative contracted with λ
        return jax.jvp(
            lambda u: objective(u, p, c, x), (u_star,), (lam,)
        )[1]

    params_ift, cost_ift, x0_ift = jax.grad(mixed, argnums=(0, 1, 2))(
        params, cost, x0
    )

    # ---- envelope term for the cost output --------------------------------
    c_bar = cot.cost
    params_env, cost_env, x0_env = jax.grad(
        objective, argnums=(1, 2, 3)
    )(u_star, params, cost, x0)

    def combine(direct, ift, env):
        return jax.tree.map(
            lambda d, i, e: d - i + c_bar * e, direct, ift, env
        )

    params_bar = combine(params_from_x, params_ift, params_env)
    cost_bar = combine(
        jax.tree.map(jnp.zeros_like, cost), cost_ift, cost_env
    )
    x0_bar = combine(x0_from_x, x0_ift, x0_env)

    # initial_traj cotangent: only the initial state influences the solution
    traj_bar = jax.tree.map(jnp.zeros_like, initial_traj)
    traj_bar = Trajectory(
        times=traj_bar.times,
        states=jax.tree.map(
            lambda buf, leaf: buf.at[0].set(leaf), traj_bar.states, x0_bar
        ),
        controls=traj_bar.controls,
    )
    return params_bar, cost_bar, traj_bar


solve_implicit.defvjp(_solve_implicit_fwd, _solve_implicit_bwd)
