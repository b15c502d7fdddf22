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


def _stage_curvature_joint(params, q_weight, x, u, x_d, dt_s, model):
    """(f_hess (12, 12+m, 12+m), c_xx (12, 12)) for ONE stage: the FULL
    second derivative of the Lie-lifted stage map in the JOINT (tau_x,
    delta_u) tangent — f_xx, f_xu AND f_uu blocks. For a single-step
    rigid-body stage f_uu = f_ux = 0 exactly and this reduces to
    _stage_curvature zero-padded; for a CHAINED (substepped) stage map
    the control feeds every substep, so the state curvature of later
    substeps pulls back through control Jacobians into nonzero f_uu/f_xu
    (the terms the kernels' chained closed form produces —
    kernels/backward._riccati_stage ddp+substeps)."""
    dtype = u.dtype
    m = u.shape[-1]
    tau0 = jnp.zeros((12 + m,), dtype)
    f0 = model.discrete_dynamics(params, x, u, dt_s)

    def lifted_dynamics(tau):
        xn = model.discrete_dynamics(
            params, model.add(x, tau[:12]), u + tau[12:], dt_s
        )
        return model.minus(xn, f0)

    f_hess = jax.jacfwd(jax.jacfwd(lifted_dynamics))(tau0)
    f_hess = 0.5 * (f_hess + jnp.swapaxes(f_hess, -1, -2))

    def lifted_state_cost(tau):
        dx = model.minus(model.add(x, tau[:12]), x_d)
        return jnp.einsum("i,ij,j->", dx, q_weight, dx)

    c_xx = jax.hessian(lifted_state_cost)(tau0)[:12, :12]
    c_xx = 0.5 * (c_xx + jnp.swapaxes(c_xx, -1, -2))
    return f_hess, c_xx


def stage_curvatures_joint(params, cost, traj, dt_s, model=qm):
    """Joint-tangent curvature tensors for all N stages:
    (f_hess (N, 12, 12+m, 12+m), c_xx (N, 12, 12)) — see
    _stage_curvature_joint. The FDDP/DDP backward passes contract
    v·f_hess and split the blocks into Q_xx / Q_xu / Q_uu."""
    states_f = jax.tree.map(lambda l: jnp.moveaxis(l, -2, 0), traj.states)
    controls_f = jnp.moveaxis(traj.controls, -2, 0)
    xd_f = jax.tree.map(lambda l: jnp.moveaxis(l, -2, 0), cost.desired_states)
    f_hess, c_xx = jax.vmap(
        lambda x, u, xd: _stage_curvature_joint(
            params, cost.Q, x, u, xd, dt_s, model
        )
    )(states_f, controls_f, xd_f)
    if cost.stage_weights is not None:
        c_xx = c_xx * cost.stage_weights[..., None, None]
    return f_hess, c_xx


def _ad_cotangent_matrix(w):
    """C(w) with wᵀ ad_u y = uᵀ C(w) y on se(3) ([lin, ang] ordering):
    C = [[0, -hat(w_rho)], [-hat(w_rho), -hat(w_theta)]]."""
    from ..lie import se3 as _se3  # noqa: F401 (convention reference)
    from ..lie import so3

    hr = so3.hat(w[..., 0:3])
    ht = so3.hat(w[..., 3:6])
    zero = jnp.zeros_like(hr)
    top = jnp.concatenate([zero, -hr], axis=-1)
    bot = jnp.concatenate([-hr, -ht], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _sym(m):
    return 0.5 * (m + jnp.swapaxes(m, -1, -2))


def vfxx_analytic(dt_s, quat, vel, g_mpss, inertia, inertia_inv, v_x):
    """Closed-form Σᵢ (v_x)ᵢ f_xx[i] (12,12, symmetric) for the rigid-body
    LaneModel family (kernels/models.py: Lie-Euler pose step + velocity
    drift [-g Rᵀe_z; -I⁻¹(ω×Iω)] + control-affine actuation, so
    f_uu = f_ux = 0 and only this Q_xx term exists).

    Derivation (verified against nested jax.jacfwd in tests/test_ddp.py):
    the lifted step φ(τ) = f(x⊕τ, u) ⊖ f(x, u) decomposes, with
    a = dt·vel, p = Adj(Exp(-a))τ_p, m(s) = Log(Exp(-a)Exp(a+s)),
    s = dt·τ_v, into φ_pose = p + m(s) + ½[p, m(s)] + O(³) (BCH; exactly
    linear in τ_p alone, so the (τ_p,τ_p) pose block vanishes) plus the
    exact velocity-drift Hessians. Contracting with w = v_x:

      * (τ_p, τ_v):   ½·dt·Adj(Exp(-a))ᵀ C(w_p) Jr(a)
      * (τ_v, τ_v):   dt²·sym(½ Jr(a)ᵀ C(w_p) Jr(a) + D[Jr(a)ᵀw_p]ᵀ)
                      (m'' = ½ad_{Jr s}Jr s + DJr[s]s; the ad part's
                      quadratic form vanishes by polarization after
                      symmetrization, leaving the se3.right_jacobian_t_jac
                      primitive)
      * gravity (θ,θ):   dt·(-g/2)(w̄rᵀ + rw̄ᵀ - 2(w̄·r)I₃),
                         w̄ = v_x[6:9], r = Rᵀe_z
      * gyroscopic (ω,ω): dt·(hat(y)I - I hat(y)),  y = I⁻¹ v_x[9:12]

    This is the kernel-side DDP curvature (kernels/lanes.py mirrors it);
    the XLA solvers keep the nested-jacfwd tensors (solver/ddp.py
    stage_curvatures) as the independent reference implementation."""
    from ..lie import se3, so3

    dtype = vel.dtype
    a = dt_s * vel
    jr = se3.right_jacobian(a)
    adj_inv = se3.adjoint(se3.inverse(se3.exp(a)))
    w_p = v_x[..., 0:6]
    c_w = _ad_cotangent_matrix(w_p)
    g_ps = (0.5 * dt_s) * (
        jnp.swapaxes(adj_inv, -1, -2) @ c_w @ jr
    )  # (6,6) into block [0:6, 6:12]
    t_hat = jnp.swapaxes(se3.right_jacobian_t_jac(a, w_p), -1, -2)
    g_ss = (dt_s * dt_s) * _sym(
        0.5 * jnp.swapaxes(jr, -1, -2) @ c_w @ jr + t_hat
    )

    ez = jnp.zeros(vel.shape[:-1] + (3,), dtype).at[..., 2].set(1.0)
    r_t_ez = so3.quat_rotate(so3.quat_conjugate(quat), ez)
    w_lin = v_x[..., 6:9]
    wr = jnp.sum(w_lin * r_t_ez, axis=-1)[..., None, None]
    eye3 = jnp.eye(3, dtype=dtype)
    g_grav = (dt_s * (-0.5) * g_mpss) * (
        w_lin[..., :, None] * r_t_ez[..., None, :]
        + r_t_ez[..., :, None] * w_lin[..., None, :]
        - 2.0 * wr * eye3
    )

    y = jnp.einsum("...ij,...j->...i", inertia_inv, v_x[..., 9:12])
    hy = so3.hat(y)
    g_gyro = dt_s * (hy @ inertia - inertia @ hy)

    out = jnp.zeros(vel.shape[:-1] + (12, 12), dtype)
    out = out.at[..., 0:6, 6:12].set(g_ps)
    out = out.at[..., 6:12, 0:6].set(jnp.swapaxes(g_ps, -1, -2))
    out = out.at[..., 6:12, 6:12].add(g_ss)
    out = out.at[..., 3:6, 3:6].add(g_grav)
    out = out.at[..., 9:12, 9:12].add(g_gyro)
    return out


def cxx_curvature_correction(tau_p, w_inv, qdx6):
    """Closed-form (exact c_xx − Gauss-Newton c_xx): the curvature of the
    Lie ``(-)`` residual, nonzero only in the pose block (0:6, 0:6).

    With e₀ = tau_p the pose residual, J = Jr(e₀), W = J⁻¹ (the GN
    weight matrix already computed by the cost diffs), z = (Q dx)[0:6]:
    the residual map L(τ) = Log(Exp(e₀)Exp(τ)) has
    L''(0) = −J⁻¹ m''(0)[J⁻¹·, J⁻¹·] (inverse-function rule on the same
    m-map as vfxx_analytic), so

        Δ = 2 zᵀL'' = −(sym(C(w̃)) + 2·sym(Wᵀ D[Jr(e₀)ᵀw̃]ᵀ W)),
        w̃ = Wᵀ z

    (the ½JᵀC(w̃)J term conjugates to exactly ½C(w̃)). Verified against
    jax.hessian of the lifted stage cost in tests/test_ddp.py."""
    from ..lie import se3

    w_tilde = jnp.einsum("...ji,...j->...i", w_inv, qdx6)
    c_w = _ad_cotangent_matrix(w_tilde)
    t_hat = jnp.swapaxes(se3.right_jacobian_t_jac(tau_p, w_tilde), -1, -2)
    inner = jnp.swapaxes(w_inv, -1, -2) @ t_hat @ w_inv
    return -(_sym(c_w) + 2.0 * _sym(inner))


def exact_cxx_analytic(cost, traj):
    """Exact state Hessians for ALL N stages via the closed-form Lie
    correction — the analytic counterpart of stage_curvatures' jax.hessian
    c_xx, with the kernel's exact operation ORDER (Gauss-Newton blocks,
    correction added into the pose block, stage weights applied LAST) so
    the fused engines match lane-for-lane (kernels/backward.py
    _stage_cost_diffs exact=True). Single scenario; (N, 12, 12)."""
    from ..lie import se3

    des = cost.desired_states
    dx_pose = se3.minus(traj.states.pose, des.pose)  # (N, 6)
    dx = jnp.concatenate([dx_pose, traj.states.vel - des.vel], axis=-1)
    w_inv = se3.right_jacobian_inv(dx_pose)  # (N, 6, 6)
    q = cost.Q
    qdx = jnp.einsum("...ij,...nj->...ni", q, dx)
    qjd_l = jnp.einsum("...ij,...njk->...nik", q[..., :, 0:6], w_inv)
    qjd_r = jnp.broadcast_to(
        q[..., None, :, 6:12], qjd_l.shape[:-1] + (6,)
    )
    qjd = jnp.concatenate([qjd_l, qjd_r], axis=-1)  # (N, 12, 12)
    top = 2.0 * jnp.einsum(
        "...nji,...njk->...nik", w_inv, qjd[..., 0:6, :]
    )  # (N, 6, 12)
    corr = cxx_curvature_correction(dx_pose, w_inv, qdx[..., 0:6])
    top = jnp.concatenate(
        [top[..., 0:6] + corr, top[..., 6:12]], axis=-1
    )
    c_xx = jnp.concatenate([top, 2.0 * qjd[..., 6:12, :]], axis=-2)
    if cost.stage_weights is not None:
        c_xx = c_xx * cost.stage_weights[..., None, None]
    return c_xx


def curvature_params(params, dtype):
    """(g, inertia, inertia_inv) operands for vfxx_analytic, from any
    rigid-body params pytree (quadrotor / multirotor / wrench — all carry
    g_mpss + inertia)."""
    from ..ops.linalg import chol_solve_small

    inertia = jnp.asarray(params.inertia, dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    inertia_inv = chol_solve_small(inertia, eye3)
    return jnp.asarray(params.g_mpss, dtype), inertia, inertia_inv


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
