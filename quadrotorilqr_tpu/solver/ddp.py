"""Full DDP: exact second-order (curvature) terms in the backward pass.

The reference solver (/root/reference/src/ilqr.hh:118-124) — like this
package's default `solver.ilqr.backward_pass` — is an iLQR: the Q-expansion
keeps only first-order dynamics information (J_x, J_u) and the Gauss-Newton
cost Hessian (cost.hh:50-58 ignores the curvature of the Lie ``(-)``).
Differential Dynamic Programming additionally carries the second-order
expansion of the stage map, which restores locally quadratic convergence on
strongly nonlinear problems (large attitude errors, aggressive maneuvers).

For every model in this package's LaneModel family (kernels/models.py), the
discrete dynamics have the structure

    pose_next = pose (+) dt*v                      (control-independent)
    vel_next  = vel + dt*(drift(x) + B_u(params) @ u)   (affine in u,
                                                        state-independent B_u)

so the lifted second derivatives w.r.t. the control vanish EXACTLY:
f_uu == 0 and f_ux == 0 (the only u-dependence is linear with a constant
coefficient). Full DDP for this family therefore needs exactly two
curvature objects per stage, both obtained by nested forward-mode autodiff
of the Lie-lifted stage map — no hand-derived second-order chain rules:

  * f_xx (12,12,12): Hessian of  tau -> f(x (+) tau, u) (-) f(x, u),
    contracted with the next-stage value gradient inside the recursion:
        Q_xx = C_xx + J_x' V_xx J_x + sum_i (v_x)_i (f_xx)_i    [DDP term]
  * exact C_xx: `jax.hessian` of  tau -> stage_cost(x (+) tau, u) — the
    Gauss-Newton approximation plus the curvature of the ``(-)`` residual
    (assumes symmetric Q, which the true-gradient interpretation of the
    reference cost requires anyway; see costs/quadratic.py NOTE).

Q_u, Q_uu, Q_xu and the gain solve are IDENTICAL to the iLQR stage — in
particular Quu keeps the same SPD structure (cuu = 2R plus the propagated
J_u' V_xx J_u), so no extra regularization machinery is required beyond the
existing `quu_reg` option; exactness enters only through Q_xx/V_xx.

TPU-first structure: the curvature tensors are computed for ALL N stages at
once (vmap over the horizon — the nested-jacfwd trig/Lie math is embarrassingly
stage-parallel) and the sequential Riccati scan body only adds one
(12)x(12,12,12) contraction. Single-scenario like `solver.ilqr.solve`;
compose with `jax.vmap` for batches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..costs import quadratic as qc
from ..models import quadrotor as qm
from .ilqr import apply_quu_reg, quadratize, riccati_gains_update


def _stage_curvature(params, q_weight, x, u, x_d, dt_s, model):
    """(f_xx (12,12,12), c_xx (12,12)) for ONE stage, via nested jacfwd on
    the Lie-lifted stage map (see module docstring). Axis order of f_xx is
    [output tangent i, d tau_a, d tau_b]."""
    dtype = u.dtype
    tau0 = jnp.zeros((12,), dtype)
    f0 = model.discrete_dynamics(params, x, u, dt_s)

    def lifted_dynamics(tau):
        xn = model.discrete_dynamics(params, model.add(x, tau), u, dt_s)
        return model.minus(xn, f0)

    f_xx = jax.jacfwd(jax.jacfwd(lifted_dynamics))(tau0)
    f_xx = 0.5 * (f_xx + jnp.swapaxes(f_xx, -1, -2))

    def lifted_state_cost(tau):
        dx = model.minus(model.add(x, tau), x_d)
        return jnp.einsum("i,ij,j->", dx, q_weight, dx)

    c_xx = jax.hessian(lifted_state_cost)(tau0)
    c_xx = 0.5 * (c_xx + jnp.swapaxes(c_xx, -1, -2))
    return f_xx, c_xx


def stage_curvatures(params, cost, traj, dt_s, model=qm):
    """Curvature tensors for all N stages at once (stage-parallel):
    (f_xx (N,12,12,12), c_xx (N,12,12)). Single scenario. Honors
    cost.stage_weights (scales the exact cost Hessian like the
    Gauss-Newton one, costs/quadratic.py)."""
    states_f = jax.tree.map(lambda l: jnp.moveaxis(l, -2, 0), traj.states)
    controls_f = jnp.moveaxis(traj.controls, -2, 0)
    xd_f = jax.tree.map(lambda l: jnp.moveaxis(l, -2, 0), cost.desired_states)
    f_xx, c_xx = jax.vmap(
        lambda x, u, xd: _stage_curvature(params, cost.Q, x, u, xd, dt_s, model)
    )(states_f, controls_f, xd_f)
    if cost.stage_weights is not None:
        c_xx = c_xx * cost.stage_weights[..., None, None]
    return f_xx, c_xx


def backward_pass_ddp(params, cost, traj, dt_s, quu_reg=0.0, model=qm):
    """DDP Riccati recursion — drop-in replacement for
    `solver.ilqr.backward_pass` (same signature and return layout) with the
    exact C_xx and the v_x . f_xx curvature term in Q_xx. Single scenario."""
    with jax.default_matmul_precision("highest"):
        j_x, j_u, c_x, c_u, _, c_uu = quadratize(params, cost, traj, dt_s, model)
        f_xx, c_xx = stage_curvatures(params, cost, traj, dt_s, model)

        def stage(carry, inputs):
            v_x, v_xx, qutk, ktquuk = carry
            jx, ju, fxx, cx, cu, cxx, cuu = inputs
            jxt = jnp.swapaxes(jx, -1, -2)
            jut = jnp.swapaxes(ju, -1, -2)
            vxx_ju = v_xx @ ju
            q_x = cx + jxt @ v_x
            q_u = cu + jut @ v_x
            # The DDP term: second-order dynamics curvature weighted by the
            # incoming value gradient (f_uu == f_ux == 0 for this model
            # family — see module docstring — so only Q_xx changes).
            q_xx = cxx + jxt @ (v_xx @ jx) + jnp.einsum("i,iab->ab", v_x, fxx)
            q_uu = apply_quu_reg(cuu + jut @ vxx_ju, quu_reg)
            q_xu = jxt @ vxx_ju  # C.xu == 0 exactly (cost.hh:57)

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
            stage, init, (j_x, j_u, f_xx, c_x, c_u, c_xx, c_uu), reverse=True
        )
        return ks, big_ks, qutk, ktquuk
