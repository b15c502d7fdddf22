"""Fused Pallas backward pass: per-stage quadratization + Riccati recursion.

One kernel invocation handles a 128-scenario lane tile: for each horizon
stage (reverse fori_loop) it computes the discrete-dynamics Jacobian j_x
(quadrotor_model.cc:33-49 chain rule, exploiting its block sparsity — see
below), the Gauss-Newton cost differentials (cost.hh:36-61), and the Riccati
update with the unregularized 4x4 Quu Cholesky solve (ilqr.hh:97-147) —
entirely in VMEM, never materializing (B, N, 12, 12) Jacobians in HBM.

Block structure used (derived from quadrotor_model.cc:42-46 with
j_cont_u[0:6,:] == 0):

    j_x = [[ J_plus_x            dt * J_plus_t          ]
           [ [0 dt*A; 0 0]       [[I3, 0], [0, I3+dt*D]] ]]
    j_u = dt * j_cont_u                       (stage-constant, shared params)

with A = -g hat(R^T e_z), D = -I^-1 (hat(w) I - hat(I w)), J_plus_x =
Adj(Exp(dt v))^-1, J_plus_t = Jr_SE3(dt v).

Physical params (quadrotor_model.hh:7-9) may be SHARED across the batch or
PER-SCENARIO (Monte-Carlo over mass/inertia/arm length/g): every param
operand — g, inertia, its inverse, and the stage-constant j_u — enters the
kernel as a lane tile, either one broadcast tile the grid re-reads (shared)
or a per-lane (d..., B) tensor (batched). j_u = dt * j_cont_u is constant
over STAGES for either case because params never vary along the horizon.
Cost weights and the desired trajectory may likewise be shared or
per-scenario (BASELINE.json config 3).
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lanes as L

TILE = 128

# SUPERTILE layout (benchmarks/layout_probe.py): 1024 scenarios per grid
# step, 8 riding the SUBLANE dim and 128 the lane dim — (r, c, 8, 128)
# lane matrices are perfectly dense for every (r, c) (the minor-lane
# layout wastes (8 - c % 8) % 8 sublanes per row at c < 8) and transposes
# become free leading-dim swaps. Measured 1.22x on the Riccati stage mix
# and ~100x faster Mosaic compiles. VMEM per stage is 8x the 128-lane
# tile's, so the horizon budget shrinks accordingly. (Defined here — the
# shared bottom of the kernel stack — and re-exported by kernels/solve.py;
# every kernel family rides it since round 5.)
SUPER_SUB = 8
SUPER_TILE = SUPER_SUB * TILE  # 1024 scenarios


def _to_super(a):
    """(..., B) per-lane array -> (..., 8, S*128): supertile s's (8, 128)
    block holds scenarios [s*1024, (s+1)*1024), row-major (sublane-major
    within the block)."""
    core = a.shape[:-1]
    s = a.shape[-1] // SUPER_TILE
    x = a.reshape(core + (s, SUPER_SUB, TILE))
    x = jnp.moveaxis(x, -3, -2)
    return x.reshape(core + (SUPER_SUB, s * TILE))


def _from_super(a, batch):
    """Inverse of _to_super: (..., 8, S*128) -> (..., batch)."""
    core = a.shape[:-2]
    s = batch // SUPER_TILE
    x = a.reshape(core + (SUPER_SUB, s, TILE))
    x = jnp.moveaxis(x, -2, -3)
    return x.reshape(core + (batch,))


def _stage_jx_blocks(dt, g, v, quat, i_l, iinv_l, drag=None):
    """Nonzero blocks of j_x (see module docstring):

        j_x = [[ P (6,6)   T (6,6)                  ]
               [ 0 | G     [[Lᵈ, 0], [0, M]]        ]]    (G at rows 6:9, cols 3:6)

    with P = Adj(Exp(dt v))^-1, T = dt Jr_SE3(dt v), G = -dt g hat(R^T e_z),
    M = I3 + dt D, and Lᵈ = I3 for the drag-free family. Never materialized
    dense — the Riccati products below exploit the sparsity (45% fewer
    FLOPs than 12x12 dense, and no block assembly/relayout inside the scan
    body). `g` is scalar or (1, 1, b) (per-lane gravity); `i_l`/`iinv_l`
    are (3, 3, b) lane tiles.

    `drag=(dl, da)` ((3, B) lane rows: drag_lin/m and drag_ang —
    models/quadrotor_drag.py) extends the family with body-frame diagonal
    velocity drag: Lᵈ = I3 - dt·diag(dl) stays DIAGONAL (returned as the
    (3, B) row l_diag; None means the exact identity and the product
    helpers skip the multiply — bit-identical to the drag-free family),
    and D gains the -I⁻¹ diag(da) term
    (quadrotor_drag.continuous_dynamics_jacobians)."""
    bshape = quat.shape[1:]  # (B,) lane layout / (8, 128) supertile
    dtype = quat.dtype
    ez = jnp.concatenate(
        [jnp.zeros((2,) + bshape, dtype), jnp.ones((1,) + bshape, dtype)],
        axis=0,
    )
    r_t_ez = L.quat_rotate(L.quat_conjugate(quat), ez)
    g_blk = (-dt * g) * L.hat(r_t_ez)
    omega = v[3:6]
    i_omega = L.matvec(i_l, omega)
    inner = L.matmul(L.hat(omega), i_l) - L.hat(i_omega)
    l_diag = None
    if drag is not None:
        dl, da = drag
        inner = inner + L.diag3(da)
        l_diag = 1.0 - dt * dl  # (3, B): the diagonal of Lᵈ
    d_blk = -L.matmul(iinv_l, inner)
    m_blk = L.eye(3, quat) + dt * d_blk
    tau = dt * v
    qe, te = L.se3_exp(tau)
    p_blk = L.se3_adjoint(*L.se3_inverse(qe, te))
    t_blk = dt * L.se3_right_jacobian(tau)
    return p_blk, t_blk, g_blk, m_blk, l_diag


def _mat_jx(x, p, t, g, m, l_diag=None):
    """X @ j_x for X (r, 12, B), exploiting j_x's block sparsity."""
    x06 = x[:, 0:6]
    x69 = x[:, 6:9]
    x912 = x[:, 9:12]
    c06 = L.matmul(x06, p)  # (r, 6, B)
    g_part = L.matmul(x69, g)  # (r, 3, B) into cols 3:6
    t_part = L.matmul(x06, t)  # (r, 6, B) into cols 6:12
    xl = x69 if l_diag is None else x69 * l_diag[None]
    return jnp.concatenate(
        [
            c06[:, 0:3],
            c06[:, 3:6] + g_part,
            t_part[:, 0:3] + xl,
            t_part[:, 3:6] + L.matmul(x912, m),
        ],
        axis=1,
    )


def _jxt_mat(x, p, t, g, m, l_diag=None):
    """j_x^T @ X for X (12, c, B), exploiting j_x's block sparsity."""
    x06 = x[0:6]
    x69 = x[6:9]
    x912 = x[9:12]
    r06 = L.matmul(L.transpose(p), x06)  # (6, c, B)
    g_part = L.matmul(L.transpose(g), x69)  # (3, c, B) into rows 3:6
    t_part = L.matmul(L.transpose(t), x06)  # (6, c, B) into rows 6:12
    xl = x69 if l_diag is None else x69 * l_diag[:, None]
    return jnp.concatenate(
        [
            r06[0:3],
            r06[3:6] + g_part,
            t_part[0:3] + xl,
            t_part[3:6] + L.matmul(L.transpose(m), x912),
        ],
        axis=0,
    )


def _jxt_vec(x, p, t, g, m, l_diag=None):
    """j_x^T @ x for a vector x (12, B)."""
    return _jxt_mat(jnp.expand_dims(x, 1), p, t, g, m, l_diag)[:, 0, :]


def _jx_vec(x, p, t, g, m, l_diag=None):
    """j_x @ x for a vector x (12, B), exploiting the same block sparsity
    (j_x[0:6,0:6]=P, j_x[0:6,6:12]=T, j_x[6:9,3:6]=G, j_x[6:9,6:9]=Lᵈ,
    j_x[9:12,9:12]=M — see _stage_jx_blocks). Used by the FDDP kernel's
    forward quadratic-model recursion (kernels/fddp.py)."""
    x69 = x[6:9] if l_diag is None else l_diag * x[6:9]
    return jnp.concatenate(
        [
            L.matvec(p, x[0:6]) + L.matvec(t, x[6:12]),
            L.matvec(g, x[3:6]) + x69,
            L.matvec(m, x[9:12]),
        ],
        axis=0,
    )


def _jx_mat(x, p, t, g, m, l_diag=None):
    """j_x @ X for X (12, c, B) — the left-application counterpart of
    _mat_jx, used by the substepped control-Jacobian accumulation
    JU <- A_i @ JU + B (kernels/models.substepped_lane_model)."""
    x69 = x[6:9] if l_diag is None else l_diag[:, None] * x[6:9]
    return jnp.concatenate(
        [
            L.matmul(p, x[0:6]) + L.matmul(t, x[6:12]),
            L.matmul(g, x[3:6]) + x69,
            L.matmul(m, x[9:12]),
        ],
        axis=0,
    )


def _sym_lanes(m):
    return 0.5 * (m + L.transpose(m))


def _ad_cot_lanes(w):
    """C(w) with wᵀ ad_u y = uᵀ C(w) y on se(3) (solver/ddp.py
    _ad_cotangent_matrix in lane layout): (6, B) -> (6, 6, B)."""
    hr = L.hat(w[0:3])
    ht = L.hat(w[3:6])
    zero = jnp.zeros_like(hr)
    return L.block2x2(zero, -hr, -hr, -ht)


def _cxx_corr_lanes(tau_p, w_inv, z6):
    """(exact c_xx − Gauss-Newton c_xx) pose block (6, 6, B)
    (solver/ddp.cxx_curvature_correction in lane layout): the curvature of
    the Lie (-) residual, from the pose residual tau_p, the GN weight
    W = Jr(tau_p)⁻¹ and z = (Q dx)[0:6]."""
    w_inv_t = L.transpose(w_inv)
    w_tilde = L.matvec(w_inv_t, z6)
    c_w = _ad_cot_lanes(w_tilde)
    t_hat = L.transpose(L.se3_right_jacobian_t_jac(tau_p, w_tilde))
    inner = L.matmul(w_inv_t, L.matmul(t_hat, w_inv))
    return -(_sym_lanes(c_w) + 2.0 * _sym_lanes(inner))


def _vfxx_lanes(dt, g, quat, vel, i_l, iinv_l, v_x, p_blk, t_blk):
    """Σᵢ (v_x)ᵢ f_xx[i] (12, 12, B) — solver/ddp.vfxx_analytic in lane
    layout, reusing the j_x blocks already in registers: p_blk =
    Adj(Exp(-dt v)), t_blk = dt·Jr(dt v) (backward._stage_jx_blocks), so
    ½dt·AᵀCJr = ½ p_blkᵀ C t_blk and dt²·½JrᵀCJr = ½ t_blkᵀ C t_blk."""
    bshape = quat.shape[1:]
    dtype = quat.dtype
    w_p = v_x[0:6]
    c_w = _ad_cot_lanes(w_p)
    c_t = L.matmul(c_w, t_blk)
    g_ps = 0.5 * L.matmul(L.transpose(p_blk), c_t)
    t_hat = L.transpose(L.se3_right_jacobian_t_jac(dt * vel, w_p))
    g_ss = _sym_lanes(
        0.5 * L.matmul(L.transpose(t_blk), c_t) + (dt * dt) * t_hat
    )

    ez = jnp.concatenate(
        [jnp.zeros((2,) + bshape, dtype), jnp.ones((1,) + bshape, dtype)],
        axis=0,
    )
    r_t_ez = L.quat_rotate(L.quat_conjugate(quat), ez)
    w_lin = v_x[6:9]
    wr = L.dot_lanes(w_lin, r_t_ez)  # (1, B)
    g_grav = (-0.5 * dt) * g * (
        jnp.expand_dims(w_lin, 1) * jnp.expand_dims(r_t_ez, 0)
        + jnp.expand_dims(r_t_ez, 1) * jnp.expand_dims(w_lin, 0)
        - 2.0 * wr[None] * L.eye(3, quat)
    )

    y = L.matvec(iinv_l, v_x[9:12])
    hy = L.hat(y)
    g_gyro = dt * (L.matmul(hy, i_l) - L.matmul(i_l, hy))

    z33 = jnp.zeros((3, 3) + bshape, dtype)
    g_pp = L.block2x2(z33, z33, z33, g_grav)
    g_ss = g_ss + L.block2x2(z33, z33, z33, g_gyro)
    return L.block2x2(g_pp, g_ps, L.transpose(g_ps), g_ss)


def _stage_cost_diffs(quat, trans, v, u, dq, dt_r, dv, du_d, q_l, exact=False):
    """(dx, c_x, c_xx, du) for one stage (cost.hh:36-61 in lane layout).

    `exact=True` (static) replaces the Gauss-Newton c_xx with the EXACT
    state Hessian — GN plus the curvature of the Lie (-) residual in the
    pose block (_cxx_corr_lanes) — matching solver/ddp.stage_curvatures'
    nested-autodiff c_xx for the DDP kernel paths."""
    qd_inv, td_inv = L.se3_inverse(dq, dt_r)
    qr, tr = L.se3_multiply(qd_inv, td_inv, quat, trans)
    tau_p = L.se3_log(qr, tr)
    dx = jnp.concatenate([tau_p, v - dv], axis=0)
    w = L.se3_right_jacobian_inv(tau_p)
    w_t = L.transpose(w)

    qdx = L.matvec(q_l, dx)
    c_x = 2.0 * jnp.concatenate(
        [L.matvec(w_t, qdx[0:6]), qdx[6:12]], axis=0
    )
    # J_d = diag(W, I6):  c_xx = 2 J_d^T Q J_d computed blockwise
    qjd = jnp.concatenate(
        [L.matmul(q_l[:, 0:6], w), q_l[:, 6:12]], axis=1
    )  # (12, 12, B)
    top = 2.0 * L.matmul(w_t, qjd[0:6])  # (6, 12, B)
    if exact:
        corr = _cxx_corr_lanes(tau_p, w, qdx[0:6])
        top = jnp.concatenate(
            [top[:, 0:6] + corr, top[:, 6:12]], axis=1
        )
    c_xx = jnp.concatenate([top, 2.0 * qjd[6:12]], axis=0)
    du = u - du_d
    return dx, c_x, c_xx, du


def _boxqp_gains_lanes(q_uu, q_u, q_xu, lo_d, hi_d, pn_iters=4):
    """Projected-Newton box-QP gains in lane layout (the kernel counterpart
    of solver/constrained._boxqp_gains): minimize ½δᵀQuuδ + Quᵀδ subject to
    lo_d <= δ <= hi_d per lane. Returns (k, big_k) with feedback rows of
    clamped dimensions zeroed. Fixed iteration count — straight-line VPU
    code, no data-dependent control flow."""
    m = q_u.shape[0]
    dtype = q_u.dtype
    eps = jnp.asarray(1e-9 if dtype == jnp.float64 else 1e-6, dtype)
    eye = L.eye(m, q_u)

    delta = jnp.clip(
        -L.chol_solve(q_uu, jnp.expand_dims(q_u, 1))[:, 0], lo_d, hi_d
    )
    free = jnp.ones_like(delta)
    for _ in range(pn_iters):
        grad = q_u + L.matvec(q_uu, delta)
        clamped = jnp.logical_or(
            jnp.logical_and(delta <= lo_d + eps, grad > 0),
            jnp.logical_and(delta >= hi_d - eps, grad < 0),
        ).astype(dtype)
        free = 1.0 - clamped
        a = (
            q_uu * jnp.expand_dims(free, 1) * jnp.expand_dims(free, 0)
            + eye * jnp.expand_dims(clamped, 1)
        )
        rhs = q_u + L.matvec(q_uu, delta * clamped)
        step = -L.chol_solve(a, jnp.expand_dims(rhs * free, 1))[:, 0]
        delta = jnp.clip(step + delta * clamped, lo_d, hi_d)

    a = (
        q_uu * jnp.expand_dims(free, 1) * jnp.expand_dims(free, 0)
        + eye * jnp.expand_dims(1.0 - free, 1)
    )
    big_k = -L.chol_solve(a, L.transpose(q_xu) * jnp.expand_dims(free, 1))
    return delta, big_k


def _riccati_stage(
    dt, quu_reg, q_l, r2_l, g, ju, ju_t, i_l, iinv_l,
    quat, trans, vel, u, dq, dtr, dv, du_d, v_x, v_xx,
    ju_lo_row=8,
    box=None,
    w=None,
    ddp=False,
    drag=None,
    substeps=1,
    chain=None,
    penalty=None,
):
    """One reverse Riccati stage in lane layout (ilqr.hh:109-141): dynamics
    Jacobian blocks + Gauss-Newton cost diffs + Q-expansion + gains + value
    update. Returns (k, big_k, v_x', v_xx', qutk_inc, ktquuk_inc). Shared by
    the per-pass kernel below and the whole-solve kernels (kernels/solve.py,
    kernels/stream.py), and model-generic: the control dimension comes from
    `ju` (12, u_dim, B) and `ju_lo_row` is its first nonzero state row
    (kernels/models.py — 8 for the quadrotor, 6 for the SE(3) wrench).

    `box=(lo_l, hi_l)` ((m, B) lane rows) swaps the plain gain solve for
    the projected-Newton box-QP (control limits, solver/constrained.py
    semantics) and the value update for its general-gain form; box=None is
    the exact reference path, bit-identical to before.

    `w` (a (1, B) lane row or None) multiplies this stage's FULL cost
    contribution (costs/quadratic.stage_weights semantics): c_x/c_xx/c_u
    and the 2R term of Quu scale by w; quu_reg does not. w=None skips the
    multiplies — bit-identical to before.

    `ddp=True` (static) adds the full-DDP exact curvature
    (solver/ddp.py semantics, analytic instead of nested-jacfwd): the
    exact cost Hessian (_stage_cost_diffs exact=True) and the
    v_x-contracted dynamics curvature _vfxx_lanes into Q_xx. The incoming
    `v_x` is the gradient the curvature is weighted by — the FDDP kernels
    pass the gap-TRANSPORTED v_x_eff, matching the XLA path
    (solver/fddp._backward_from_derivs). f_uu = f_ux = 0 exactly for this
    model family, so Q_u/Q_uu/Q_xu and the gain solve are untouched.

    `drag=(dl, da)` ((3, B) lane rows) is the diagonal velocity-drag
    extension (models/quadrotor_drag.py; kernels/models.py
    LaneModel.drag_rows) — it reshapes only the j_x velocity blocks
    (_stage_jx_blocks); drag=None is bit-identical to before. The drag
    terms are LINEAR in velocity, so the ddp curvature (_vfxx_lanes) is
    unchanged — their second derivatives vanish exactly.

    `substeps=k > 1` (static; models/integrators.substepped at kernel
    speed) treats the stage map as k chained Lie-Euler substeps of dt/k:
    the stage Jacobian is the CHAIN j_x = A_k···A_1 — never materialized;
    every Riccati product applies the per-substep block helpers k times —
    and the control Jacobian accumulates JU <- A_i JU + B (B = the
    stage-constant per-SUBSTEP `ju` operand = (dt/k)·j_cont_u; the
    substepped LaneModel preps params at dt/k). `chain` must then supply
    (base_dynamics_step, g1, m_inv, extra, ez) to roll the intermediate
    substates.

    ddp + substeps (round 5 — the last engine refusal): the exact
    curvature of the CHAINED stage map F = f_k∘···∘f_1, by the
    second-order chain rule. With ω_j = A_{j+1}ᵀ···A_kᵀ v_x (the value
    gradient pulled back to substep j's output), C_j = A_j···A_1 and
    JU_j = Σ_{m<=j} A_j···A_{m+1}B (state/control Jacobians INTO substep
    j+1's input), and G_j = ω_{j+1}·f_xx evaluated at the rolled substate
    s_j (the per-substep analytic _vfxx_lanes at h = dt/k):

        v_x·F_xx = Σ_j C_jᵀ G_j C_j        -> Q_xx
        v_x·F_uu = Σ_j JU_jᵀ G_j JU_j      -> Q_uu
        v_x·F_xu = Σ_j C_jᵀ G_j JU_j       -> Q_xu

    Unlike the single-step family (f_uu = f_ux = 0 exactly), the chain
    HAS control curvature from the second substep on (the state fed into
    f_{j+1} depends on u), so Q_uu/Q_xu gain terms too — matching the
    XLA nested-jacfwd joint Hessian (solver/ddp.stage_curvatures_joint).
    """
    if substeps > 1:
        base_step, g1, m_inv, extra, ez = chain
        h = dt / substeps
        blocks_list = []
        substates = []
        sq, st_, sv = quat, trans, vel
        for i in range(substeps):
            substates.append((sq, sv))
            blocks_list.append(
                _stage_jx_blocks(h, g, sv, sq, i_l, iinv_l, drag)
            )
            if i < substeps - 1:
                sq, st_, sv = base_step(
                    h, g1, m_inv, extra, i_l, iinv_l, ez, sq, st_, sv, u
                )
    else:
        blocks_list = [
            _stage_jx_blocks(dt, g, vel, quat, i_l, iinv_l, drag)
        ]
    p_blk, t_blk, g_blk, m_blk, l_diag = blocks_list[0]
    _, c_x, c_xx, du = _stage_cost_diffs(
        quat, trans, vel, u, dq, dtr, dv, du_d, q_l, exact=ddp
    )
    if w is not None:
        c_x = w * c_x
        c_xx = w * c_xx
        r2_l = w * r2_l
    c_u = L.matvec(r2_l, du)
    if penalty is not None:
        pcx, pcu, pcxx, pcuu, pcxu = penalty
        c_x = c_x + pcx
        c_u = c_u + pcu
        c_xx = c_xx + pcxx
        r2_l = r2_l + pcuu  # feeds the Quu base exactly like c_uu

    lo = ju_lo_row
    m = ju.shape[1]
    if substeps > 1:
        # JU = sum_i A_k..A_{i+1} B: dense in general (A's T-block couples
        # the velocity rows of B into the pose rows from the 2nd substep on)
        ju_full = ju
        for b in blocks_list[1:]:
            ju_full = _jx_mat(ju_full, *b) + ju
        jut_full = L.transpose(ju_full)
        # chain applications: j_x^T X = A_1^T(...(A_k^T X));
        # X j_x = ((X A_k) A_{k-1})...A_1 — both iterate blocks_list reversed
        vx_c = v_x
        for b in reversed(blocks_list):
            vx_c = _jxt_vec(vx_c, *b)
        q_x = c_x + vx_c
        q_u = c_u + L.matvec(jut_full, v_x)
        vj = v_xx
        for b in reversed(blocks_list):
            vj = _mat_jx(vj, *b)
        for b in reversed(blocks_list):
            vj = _jxt_mat(vj, *b)
        q_xx = c_xx + vj
        vxx_ju = L.matmul(v_xx, ju_full)
        q_uu = (
            # L.eye takes a lane VECTOR reference for the batch shape
            r2_l + L.matmul(jut_full, vxx_ju) + quu_reg * L.eye(m, c_u)
        )
        q_xu = vxx_ju
        for b in reversed(blocks_list):
            q_xu = _jxt_mat(q_xu, *b)
        if ddp:
            # chained exact curvature (docstring): ω_j by pullback, then
            # one inside-out pass accumulating the three conjugated sums.
            # C_j / JU_j build forward (dense 12x12 / 12xm from substep 2
            # on; substep 1 contributes with C_0 = I, JU_0 = 0).
            h = dt / substeps
            omega = [None] * substeps
            wc = v_x
            for j in reversed(range(substeps)):
                omega[j] = wc
                wc = _jxt_vec(wc, *blocks_list[j])
            gxx = guu = gxu = None
            c_mat = None  # C_j (None == identity, j = 0)
            ju_acc = None  # JU_j (None == zero, j = 0)
            for j in range(substeps):
                sq_j, sv_j = substates[j]
                pb, tb = blocks_list[j][0], blocks_list[j][1]
                g_j = _vfxx_lanes(
                    h, g, sq_j, sv_j, i_l, iinv_l, omega[j], pb, tb
                )
                if c_mat is None:
                    gxx = g_j if gxx is None else gxx + g_j
                else:
                    gj_c = L.matmul(g_j, c_mat)
                    gxx = gxx + L.matmul(L.transpose(c_mat), gj_c)
                if ju_acc is not None:
                    gj_ju = L.matmul(g_j, ju_acc)
                    t_uu = L.matmul(L.transpose(ju_acc), gj_ju)
                    guu = t_uu if guu is None else guu + t_uu
                    t_xu = (
                        gj_ju
                        if c_mat is None
                        else L.matmul(L.transpose(c_mat), gj_ju)
                    )
                    gxu = t_xu if gxu is None else gxu + t_xu
                if j < substeps - 1:
                    c_mat = (
                        _jx_mat(L.eye(12, c_u), *blocks_list[j])
                        if c_mat is None
                        else _jx_mat(c_mat, *blocks_list[j])
                    )
                    ju_acc = (
                        ju
                        if ju_acc is None
                        else _jx_mat(ju_acc, *blocks_list[j]) + ju
                    )
            q_xx = q_xx + gxx
            if guu is not None:
                q_uu = q_uu + _sym_lanes(guu)
                q_xu = q_xu + gxu
        if penalty is not None:
            q_xu = q_xu + pcxu
    else:
        blocks = (p_blk, t_blk, g_blk, m_blk, l_diag)
        q_x = c_x + _jxt_vec(v_x, *blocks)
        # j_u is block-sparse too: only state rows ju_lo_row:12 are nonzero
        # (quadrotor: body-z thrust + angular accel; wrench: full
        # actuation), so every j_u contraction runs over those rows only —
        # bit-exact (the dropped products are exact zeros) and ~8% fewer
        # FLOPs per stage for the quadrotor.
        ju_lo = ju[lo:12]  # (12-lo, u_dim, B)
        jut_lo = ju_t[:, lo:12]
        q_u = c_u + L.matvec(jut_lo, v_x[lo:12])
        vxx_jx = _mat_jx(v_xx, *blocks)
        q_xx = c_xx + _jxt_mat(vxx_jx, *blocks)
        if ddp:
            q_xx = q_xx + _vfxx_lanes(
                dt, g, quat, vel, i_l, iinv_l, v_x, p_blk, t_blk
            )
        vxx_ju = L.matmul(v_xx[:, lo:12], ju_lo)
        q_uu = (
            r2_l + L.matmul(jut_lo, vxx_ju[lo:12]) + quu_reg * L.eye(m, c_u)
        )
        q_xu = _jxt_mat(vxx_ju, *blocks)
        if penalty is not None:
            q_xu = q_xu + pcxu

    if box is not None:
        lo_l, hi_l = box
        k, big_k = _boxqp_gains_lanes(q_uu, q_u, q_xu, lo_l - u, hi_l - u)
        quu_k = L.matvec(q_uu, k)
        big_kt = L.transpose(big_k)
        # general-gain value update (solver/constrained.py): with clamped
        # rows of K zeroed the unconstrained simplification no longer holds
        v_x_new = (
            q_x
            + L.matvec(big_kt, quu_k)
            + L.matvec(big_kt, q_u)
            + L.matvec(q_xu, k)
        )
        s = (
            q_xx
            + L.matmul(q_xu, big_k)
            + L.matmul(big_kt, L.transpose(q_xu))
            + L.matmul(big_kt, L.matmul(q_uu, big_k))
        )
        v_xx_new = 0.5 * (s + L.transpose(s))
        return (
            k, big_k, v_x_new, v_xx_new,
            L.dot_lanes(q_u, k), L.dot_lanes(k, quu_k),
        )

    rhs = jnp.concatenate([jnp.expand_dims(q_u, 1), L.transpose(q_xu)], axis=1)
    sol = -L.chol_solve(q_uu, rhs)
    k = jax.lax.index_in_dim(sol, 0, 1, keepdims=False)
    big_k = sol[:, 1:, :]

    quu_k = L.matvec(q_uu, k)
    big_kt = L.transpose(big_k)
    v_x_new = q_x - L.matvec(big_kt, quu_k)
    # Per-stage symmetrization: in f32 the recursion AMPLIFIES v_xx's
    # roundoff asymmetry exponentially (rel asym 9e-8 in f64 vs 1.9 in raw
    # f32 at N=512 on the hover workload), exploding v_xx ~20,000x and
    # driving Quu indefinite (Cholesky NaN). Projecting back onto symmetry
    # each stage keeps f32 exactly as conditioned as f64 out to N=8192
    # (measured); in f64 it changes results at the 1e-16 level only. Same
    # cure as the associative path's per-combine symmetrization.
    s = q_xx - L.matmul(big_kt, L.matmul(q_uu, big_k))
    v_xx_new = 0.5 * (s + L.transpose(s))
    return k, big_k, v_x_new, v_xx_new, L.dot_lanes(q_u, k), L.dot_lanes(k, quu_k)


def _backward_kernel(
    n_stages,
    lane_model,  # model family descriptor (kernels/models.py)
    use_box,  # static: control limits active (lo/hi refs read)
    use_weights,  # static: per-stage cost weights active (w_ref read)
    use_penalty,  # static: AL penalty operands active (p*_ref read)
    scal_ref,  # SMEM (4,): [dt, quu_reg, unused, unused]
    act_ref,  # SMEM (n_tiles,) i32: per-tile any-lane-active flags
    q_ref,  # (N, 4, Bt) state quats
    t_ref,  # (N, 3, Bt)
    v_ref,  # (N, 6, Bt)
    u_ref,  # (N, u, Bt)
    dq_ref,  # (N, 4, Bt) desired quats (broadcast tile or per-lane)
    dt_ref,  # (N, 3, Bt)
    dv_ref,  # (N, 6, Bt)
    du_ref,  # (N, u, Bt)
    qmat_ref,  # (12, 12, Bt) cost Q (broadcast or per-lane)
    r2_ref,  # (u, u, Bt) 2R (broadcast or per-lane)
    w_ref,  # (N, 1, Bt) stage weights ((1, 1, Bt) dummy when !use_weights)
    g_ref,  # (1, 1, Bt) gravity (broadcast or per-lane)
    minv_ref,  # (1, 1, Bt) 1/mass (rolls the substep chain; r5)
    ju_ref,  # (12, u, Bt) stage-constant j_u (broadcast or per-lane)
    extra_ref,  # per-model operand (drag rows live here for drag families)
    i_ref,  # (3, 3, Bt) inertia (broadcast or per-lane)
    iinv_ref,  # (3, 3, Bt)
    lo_ref,  # (u, Bt) control lower bounds ((1, Bt) dummy when !use_box)
    hi_ref,  # (u, Bt) upper bounds
    pcx_ref,  # (N, 12, Bt) AL penalty gradient wrt x (dummies when
    pcu_ref,  # (N, u, Bt)   !use_penalty — solver/auglag quadratization)
    pcxx_ref,  # (N, 12, 12, Bt)
    pcuu_ref,  # (N, u, u, Bt)
    pcxu_ref,  # (N, 12, u, Bt) the nonzero cost cross term
    ks_ref,  # out (N, u, Bt)
    bigks_ref,  # out (N, u, 12, Bt)
    red_ref,  # out (2, Bt): [QuTk, kTQuuk]
):
    # tiles whose 128 lanes are ALL done skip the pass entirely (their stale
    # outputs are never selected by the per-lane merge masks downstream) —
    # with status-compacted batches this turns straggler trips into DMA-only
    # no-ops for most of the grid.
    @pl.when(act_ref[pl.program_id(0)] > 0)
    def _():
        dt = scal_ref[0]
        g = g_ref[:]  # (1, 1, bt): broadcasts against (r, c, bt) lane matrices
        quu_reg = scal_ref[1]
        q_l = qmat_ref[:]
        r2_l = r2_ref[:]
        ju = ju_ref[:]
        ju_t = L.transpose(ju)
        i_l = i_ref[:]
        iinv_l = iinv_ref[:]
        drag = lane_model.drag_rows(extra_ref[:])
        box = (lo_ref[:], hi_ref[:]) if use_box else None
        # (Bt,) lane layout / (8, 128) supertile: the body is layout-
        # agnostic (kernels/solve.py pattern)
        bshape = q_l.shape[2:]
        dtype = q_l.dtype
        # substepped integration (r5: the per-pass kernel's refusal
        # removed) — the chain rolls intermediate substates with the BASE
        # single-step dynamics, same mapping as the whole-solve kernels
        if lane_model.substeps > 1:
            ez = jnp.concatenate(
                [
                    jnp.zeros((2,) + bshape, dtype),
                    jnp.ones((1,) + bshape, dtype),
                ],
                axis=0,
            )
            chain = (
                lane_model.base.dynamics_step, g_ref[0], minv_ref[0],
                extra_ref[:], ez,
            )
        else:
            chain = None

        def stage(idx, carry):
            n = n_stages - 1 - idx
            v_x, v_xx, qutk, ktquuk = carry
            k, big_k, v_x_new, v_xx_new, qutk_inc, ktquuk_inc = _riccati_stage(
                dt, quu_reg, q_l, r2_l, g, ju, ju_t, i_l, iinv_l,
                q_ref[n], t_ref[n], v_ref[n], u_ref[n],
                dq_ref[n], dt_ref[n], dv_ref[n], du_ref[n],
                v_x, v_xx,
                ju_lo_row=lane_model.ju_lo,
                box=box,
                w=w_ref[n] if use_weights else None,
                drag=drag,
                substeps=lane_model.substeps,
                chain=chain,
                penalty=(
                    (
                        pcx_ref[n], pcu_ref[n], pcxx_ref[n], pcuu_ref[n],
                        pcxu_ref[n],
                    )
                    if use_penalty
                    else None
                ),
            )
            ks_ref[n] = k
            bigks_ref[n] = big_k
            return (v_x_new, v_xx_new, qutk + qutk_inc, ktquuk + ktquuk_inc)

        init = (
            jnp.zeros((12,) + bshape, dtype),
            jnp.zeros((12, 12) + bshape, dtype),
            jnp.zeros((1,) + bshape, dtype),
            jnp.zeros((1,) + bshape, dtype),
        )
        _, _, qutk, ktquuk = jax.lax.fori_loop(0, n_stages, stage, init)
        red_ref[:] = jnp.concatenate([qutk, ktquuk], axis=0)


def _to_lanes(a):
    """(B, N, d...) -> (N, d..., B)."""
    return jnp.moveaxis(a, 0, -1)


def _bcast_tile(a, dtype):
    """Shared array (d...,) -> (d..., TILE) broadcast."""
    a = jnp.asarray(a, dtype)
    return jnp.broadcast_to(a[..., None], a.shape + (TILE,))


def _prep_params(params, dt_s, dtype):
    """Lane-layout physical-param operands + static batched flag.

    Shared params (scalar leaves, quadrotor_model.hh:7-9) become one
    broadcast tile per operand that the kernel grid re-reads (index_map 0);
    per-scenario params (ALL leaves carrying a leading batch dim — build
    them with `jnp.broadcast_to` for any shared leaf) become per-lane
    (d..., B) tensors. Returns
    (g, ju, iinv_ma, inertia, inertia_inv, m_inv, batched) where
    j_u = dt * j_cont_u is the stage-constant discrete control Jacobian
    (constant over the horizon because params don't vary along it) and
    g / m_inv are (1, 1, B) lane rows.
    """
    from ..models.quadrotor import moment_arms
    from ..ops.linalg import chol_solve_small

    batched = jnp.ndim(params.mass_kg) >= 1
    inertia = jnp.asarray(params.inertia, dtype)
    inertia_inv = chol_solve_small(inertia, jnp.eye(3, dtype=dtype))
    ma = jnp.asarray(moment_arms(params), dtype)
    iinv_ma = inertia_inv @ ma
    mass = jnp.asarray(params.mass_kg, dtype)
    g = jnp.asarray(params.g_mpss, dtype)
    # j_u = dt * j_cont_u: row 8 = dt/m (thrust), rows 9:12 = dt I^-1 MA
    ju = jnp.zeros(jnp.shape(mass) + (12, 4), dtype)
    ju = ju.at[..., 8, :].set(
        (dt_s / mass)[..., None] if batched else dt_s / mass
    )
    ju = ju.at[..., 9:12, :].set(dt_s * iinv_ma)
    if batched:
        return (
            _to_lanes(g.reshape(-1, 1, 1)),
            _to_lanes(ju),
            _to_lanes(iinv_ma),
            _to_lanes(inertia),
            _to_lanes(inertia_inv),
            _to_lanes((1.0 / mass).reshape(-1, 1, 1)),
            True,
        )
    return (
        _bcast_tile(g.reshape(1, 1), dtype),
        _bcast_tile(ju, dtype),
        _bcast_tile(iinv_ma, dtype),
        _bcast_tile(inertia, dtype),
        _bcast_tile(inertia_inv, dtype),
        _bcast_tile((1.0 / mass).reshape(1, 1), dtype),
        False,
    )


class CostBatched(typing.NamedTuple):
    """Static PER-OPERAND-GROUP cost batchedness (hashable: rides jit
    static argnames). Round 5 split the old single any-leaf flag: a
    per-scenario Q/R (config 3) used to promote the DESIRED stream — the
    dominant per-stage VMEM — to per-lane layout too, which is what pushed
    N=200 + per-scenario Q/R past the supertile VMEM budget (the r4
    compile OOM at 138M/128M). Q/R (and params) are stage-CONSTANT tiles:
    batching them costs ~1 MB per supertile grid step, not ~14 MB."""

    des: bool  # desired q/t/v/u targets per-scenario
    qr: bool  # Q/R weight matrices per-scenario
    w: bool  # stage weights per-scenario

    @property
    def any(self):
        return self.des or self.qr or self.w

    @property
    def stagewise(self):
        """Batched PER-STAGE operands (the VMEM-budget-relevant ones:
        desired rides (N, d) rows per lane; weights ride (N, 1))."""
        return self.des or self.w


def _prep_cost(cost, batch, dtype, r_scale=1.0):
    """Lane-layout cost operands + static per-group batched flags.

    Each operand GROUP (desired targets / Q+R / stage weights) is
    materialized per-lane ((d..., B)) iff a leaf of THAT group carries a
    leading batch dim; shared groups stay single-tile broadcasts the
    kernel grid re-reads (index_map 0). Mixed batched/shared leaves
    within a group are broadcast up to batched.

    Returns (des_q, des_t, des_v, des_u, q_mat, r, w, CostBatched): `w` is
    the per-stage cost-weight operand ((N, 1, TILE-or-B);
    costs/quadratic.py stage_weights) or a (1, 1, TILE) ones dummy the
    kernels never read when weights are absent — test
    `cost.stage_weights is not None` for the static use_weights flag.
    """
    des = cost.desired_states
    sw = cost.stage_weights
    des_b = any(
        leaf.ndim == 3
        for leaf in (
            cost.desired_controls,
            des.pose.quat,
            des.pose.trans,
            des.vel,
        )
    )
    qr_b = any(leaf.ndim == 3 for leaf in (cost.Q, cost.R))
    w_b = sw is not None and jnp.ndim(sw) == 2

    def prep(a, core_ndim, batched):
        a = jnp.asarray(a, dtype)
        if not batched:
            return jnp.broadcast_to(a[..., None], a.shape + (TILE,))
        if a.ndim == core_ndim:  # shared leaf in a batched group
            a = jnp.broadcast_to(a, (batch,) + a.shape)
        return _to_lanes(a)

    if sw is None:
        w = _bcast_tile(jnp.ones((1, 1), dtype), dtype)
    else:
        w = prep(jnp.asarray(sw, dtype)[..., None], 2, w_b)  # (..., N, 1)

    return (
        prep(des.pose.quat, 2, des_b),
        prep(des.pose.trans, 2, des_b),
        prep(des.vel, 2, des_b),
        prep(cost.desired_controls, 2, des_b),
        prep(cost.Q, 2, qr_b),
        prep(r_scale * cost.R, 2, qr_b),
        w,
        CostBatched(des_b, qr_b, w_b),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "dt_s", "n", "batch", "lane_model", "use_box", "use_weights",
        "use_penalty", "cost_batched", "params_batched", "interpret",
        "supertile",
    ),
)
def _backward_call(
    scal,
    tile_act,
    states_q,
    states_t,
    states_v,
    controls,
    des_q,
    des_t,
    des_v,
    des_u,
    q_mat,
    r2,
    w,
    g,
    m_inv,
    ju,
    extra,
    inertia,
    inertia_inv,
    lo,
    hi,
    pcx,
    pcu,
    pcxx,
    pcuu,
    pcxu,
    dt_s,
    n,
    batch,
    lane_model,
    use_box,
    use_weights,
    use_penalty,
    cost_batched,
    params_batched,
    interpret,
    supertile=False,
):
    dtype = states_q.dtype
    u = controls.shape[1]  # control dimension (lane layout (N, u, B))
    w_core = w.shape[:-1]
    extra_core = extra.shape[:-1]
    bound_core = lo.shape[:-1]  # (u,) real bounds / (1,) dummy
    box_batched = lo.shape[-1] != TILE
    pen_cores = tuple(a.shape[:-1] for a in (pcx, pcu, pcxx, pcuu, pcxu))
    if supertile:
        # supertile layout (kernels/solve.py): per-lane operands
        # -> (..., 8, S*128); broadcast tiles materialize across sublanes
        n_tiles = batch // SUPER_TILE
        btile = (SUPER_SUB, TILE)

        def prep(a):
            if a.shape[-1] == TILE and batch != TILE:
                return jnp.broadcast_to(
                    a[..., None, :], a.shape[:-1] + btile
                )
            return _to_super(a)

        (
            states_q, states_t, states_v, controls, des_q, des_t, des_v,
            des_u, q_mat, r2, w, g, m_inv, ju, extra, inertia,
            inertia_inv, lo, hi, pcx, pcu, pcxx, pcuu, pcxu,
        ) = map(
            prep,
            (
                states_q, states_t, states_v, controls, des_q, des_t,
                des_v, des_u, q_mat, r2, w, g, m_inv, ju, extra, inertia,
                inertia_inv, lo, hi, pcx, pcu, pcxx, pcuu, pcxu,
            ),
        )
        lane_block = lambda shape: pl.BlockSpec(
            shape + btile,
            lambda i: (0,) * len(shape) + (0, i),
            memory_space=pltpu.VMEM,
        )
        fixed_block = lambda shape: pl.BlockSpec(
            shape + btile,
            lambda i: (0,) * (len(shape) + 2),
            memory_space=pltpu.VMEM,
        )
        obatch = (SUPER_SUB, n_tiles * TILE)
    else:
        n_tiles = batch // TILE
        btile = (TILE,)
        lane_block = lambda shape: pl.BlockSpec(
            shape + (TILE,), lambda i: (0,) * len(shape) + (i,), memory_space=pltpu.VMEM
        )
        fixed_block = lambda shape: pl.BlockSpec(
            shape + (TILE,), lambda i: (0,) * (len(shape) + 1), memory_space=pltpu.VMEM
        )
        obatch = (batch,)
    # per-GROUP cost batchedness (CostBatched): desired targets and Q/R
    # may be independently shared or per-scenario
    des_block = lane_block if cost_batched.des else fixed_block
    qr_block = lane_block if cost_batched.qr else fixed_block
    param_block = lane_block if params_batched else fixed_block
    # bounds may be shared (one (., TILE) broadcast tile; at a single tile
    # the two index maps coincide, so shape inference is unambiguous) or
    # per-scenario ((., B) lane tiles — backward._prep_limits)
    box_block = (lane_block if box_batched else fixed_block)(bound_core)
    # dummy weights are a single broadcast tile — never lane-indexed
    w_block = (
        lane_block if (use_weights and cost_batched.w) else fixed_block
    )(w_core)
    pen_blocks = tuple(
        (lane_block if use_penalty else fixed_block)(core)
        for core in pen_cores
    )
    kernel = functools.partial(
        _backward_kernel, n, lane_model, use_box, use_weights, use_penalty
    )
    ks, big_ks, red = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            lane_block((n, 4)),
            lane_block((n, 3)),
            lane_block((n, 6)),
            lane_block((n, u)),
            des_block((n, 4)),
            des_block((n, 3)),
            des_block((n, 6)),
            des_block((n, u)),
            qr_block((12, 12)),
            qr_block((u, u)),
            w_block,
            param_block((1, 1)),
            param_block((1, 1)),
            param_block((12, u)),
            param_block(extra_core),
            param_block((3, 3)),
            param_block((3, 3)),
            box_block,
            box_block,
            *pen_blocks,
        ],
        out_specs=[
            lane_block((n, u)),
            lane_block((n, u, 12)),
            lane_block((2,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, u) + obatch, dtype),
            jax.ShapeDtypeStruct((n, u, 12) + obatch, dtype),
            jax.ShapeDtypeStruct((2,) + obatch, dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(120 if supertile else 100) * 1024 * 1024
        ),
        interpret=interpret,
    )(
        scal,
        tile_act,
        states_q,
        states_t,
        states_v,
        controls,
        des_q,
        des_t,
        des_v,
        des_u,
        q_mat,
        r2,
        w,
        g,
        m_inv,
        ju,
        extra,
        inertia,
        inertia_inv,
        lo,
        hi,
        pcx,
        pcu,
        pcxx,
        pcuu,
        pcxu,
    )
    if supertile:
        return tuple(_from_super(a, batch) for a in (ks, big_ks, red))
    return ks, big_ks, red


def _prep_limits(limits, u_dim, dtype):
    """Control-bound lane tiles + static (use_box, box_batched) flags.
    `limits` is None (unconstrained — (1,) dummy tiles the kernel never
    reads) or a (lo, hi) pair where each bound is a scalar / (u_dim,) array
    shared across the batch, or a (B, u_dim) array per scenario
    (Monte-Carlo over actuator derating). Mixed shared/batched bounds are
    broadcast up to batched."""
    if limits is None:
        dummy = _bcast_tile(jnp.zeros((1,), dtype), dtype)
        return dummy, dummy, False, False
    lo = jnp.asarray(limits[0], dtype)
    hi = jnp.asarray(limits[1], dtype)
    batched = lo.ndim == 2 or hi.ndim == 2
    if batched:
        b = (lo if lo.ndim == 2 else hi).shape[0]
        lo = jnp.broadcast_to(lo, (b, u_dim))
        hi = jnp.broadcast_to(hi, (b, u_dim))
        return _to_lanes(lo), _to_lanes(hi), True, True
    lo = jnp.broadcast_to(lo, (u_dim,))
    hi = jnp.broadcast_to(hi, (u_dim,))
    return _bcast_tile(lo, dtype), _bcast_tile(hi, dtype), True, False


def backward_pass_fused(
    params, cost, traj, dt_s, quu_reg=0.0, interpret=False, tile_act=None,
    model=None, limits=None, penalty=None, supertile=False,
):
    """Drop-in batched replacement for vmap(solver.ilqr.backward_pass).

    traj leaves are (B, N, ...) with B a multiple of 128 (the lane tile).
    Cost weights / desired trajectory may be shared or carry a leading batch
    dim (per-scenario weights, BASELINE.json config 3); physical params may
    likewise be shared or per-scenario (ALL leaves with a leading B — see
    _prep_params). `tile_act` (B//128,) i32 marks tiles with any active
    lane; all-done tiles skip computation (stale outputs must be masked by
    the caller, as solver/batched.py does). `model` selects the model family
    (kernels/models.py lane_model_for; default inferred from the params
    type). `limits=(lo, hi)` (scalars / (u,) arrays shared across the
    batch, or (B, u) per scenario) switches the stage gain solve to the
    projected-Newton box-QP
    (solver/constrained.py semantics). Returns (ks (B,N,u),
    big_ks (B,N,u,12), qutk (B,), ktquuk (B,)).
    """
    from .models import lane_model_for

    lm = lane_model_for(params, model)
    controls = traj.controls
    batch, n = controls.shape[0], controls.shape[1]
    if batch % TILE != 0:
        raise ValueError(f"batch {batch} must be a multiple of {TILE}")
    dtype = controls.dtype

    # lane layouts
    states_q = _to_lanes(traj.states.pose.quat)
    states_t = _to_lanes(traj.states.pose.trans)
    states_v = _to_lanes(traj.states.vel)
    controls_l = _to_lanes(controls)

    des_q, des_t, des_v, des_u, q_mat, r2, w, cost_batched = _prep_cost(
        cost, batch, dtype, r_scale=2.0
    )
    use_weights = cost.stage_weights is not None
    g, m_inv, ju, extra, inertia, inertia_inv, params_batched = (
        lm.prep_params(params, dt_s, dtype)
    )
    lo, hi, use_box, _ = _prep_limits(limits, lm.u_dim, dtype)

    scal = jnp.asarray([dt_s, quu_reg, 0.0, 0.0], dtype)
    if supertile and batch % SUPER_TILE != 0:
        raise ValueError(
            f"supertile=True needs batch a multiple of {SUPER_TILE}, "
            f"got {batch}"
        )
    if tile_act is None:
        tile_act = jnp.ones(
            (batch // (SUPER_TILE if supertile else TILE),), jnp.int32
        )
    # AL penalty operands ((B, N, ...) per-stage quadratics incl. the
    # nonzero C_xu cross term — solver/auglag) enter as per-lane tiles;
    # rank-matched broadcast dummies otherwise
    use_penalty = penalty is not None
    if use_penalty:
        pcx, pcu, pcxx, pcuu, pcxu = (_to_lanes(a) for a in penalty)
    else:
        d1 = _bcast_tile(jnp.zeros((1, 1), dtype), dtype)
        d2 = _bcast_tile(jnp.zeros((1, 1, 1), dtype), dtype)
        pcx = pcu = d1
        pcxx = pcuu = pcxu = d2

    ks, big_ks, red = _backward_call(
        scal,
        tile_act,
        states_q,
        states_t,
        states_v,
        controls_l,
        des_q,
        des_t,
        des_v,
        des_u,
        q_mat,
        r2,
        w,
        g,
        m_inv,
        ju,
        extra,
        inertia,
        inertia_inv,
        lo,
        hi,
        pcx,
        pcu,
        pcxx,
        pcuu,
        pcxu,
        dt_s,
        n,
        batch,
        lm,
        use_box,
        use_weights,
        use_penalty,
        cost_batched,
        params_batched,
        interpret,
        supertile,
    )
    ks = jnp.moveaxis(ks, -1, 0)  # (B, N, u)
    big_ks = jnp.moveaxis(big_ks, -1, 0)  # (B, N, u, 12)
    return ks, big_ks, red[0], red[1]
