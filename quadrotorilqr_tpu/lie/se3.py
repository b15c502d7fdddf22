"""SE(3) rigid transforms — TPU-native, batch-polymorphic, manif conventions.

The group element is a pytree `SE3{quat (...,4) wxyz, trans (...,3)}`; the
tangent is a flat (...,6) array ordered **[linear(3), angular(3)]**, matching
manif::SE3Tangentd::coeffs() as used throughout the reference
(/root/reference/src/quadrotor_model.hh:30-37 index map, .cc:124-132).

Conventions (manif / right-invariant, verified against the reference usage at
/root/reference/src/quadrotor_model.cc:183-186 and :232-234):

  * Exp(tau=(rho, theta)):  R = Exp_SO3(theta),  t = Jl_SO3(theta) @ rho
  * Log(X):                 theta = Log_SO3(R),  rho = Jl_SO3(theta)^-1 @ t
  * right-plus:   X (+) tau = X * Exp(tau)
      d/dX   = Adj(Exp(tau))^-1,    d/dtau = Jr_SE3(tau)
  * right-minus:  lhs (-) rhs = Log(rhs^-1 * lhs)
      d/dlhs = Jr_SE3(tau)^-1,      d/drhs = -Jl_SE3(tau)^-1
  * Adj(R, t) = [[R, hat(t)@R], [0, R]]   (block order [lin, ang])
  * Jl_SE3(tau) = [[Jl_SO3(theta), Q(rho, theta)], [0, Jl_SO3(theta)]]
    with Q the Barfoot Q-matrix (Barfoot TRO'14 eq. 102), Jr(tau) = Jl(-tau).

Everything broadcasts over leading batch dims, preserves dtype, and is safe
under jit/vmap/grad (branchless small-angle Taylor selection).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import so3

_SMALL_ANGLE = 1e-3


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SE3:
    """Rigid transform: rotation as unit quaternion (wxyz) + translation."""

    quat: jax.Array  # (..., 4) wxyz
    trans: jax.Array  # (..., 3)

    @property
    def batch_shape(self):
        return self.trans.shape[:-1]

    @property
    def dtype(self):
        return self.trans.dtype


def identity(batch_shape=(), dtype=jnp.float32) -> SE3:
    return SE3(
        quat=so3.quat_identity(batch_shape, dtype),
        trans=jnp.zeros(batch_shape + (3,), dtype=dtype),
    )


def from_parts(quat, trans) -> SE3:
    return SE3(quat=jnp.asarray(quat), trans=jnp.asarray(trans))


def multiply(a: SE3, b: SE3) -> SE3:
    """Group composition a * b."""
    return SE3(
        quat=so3.quat_multiply(a.quat, b.quat),
        trans=a.trans + so3.quat_rotate(a.quat, b.trans),
    )


def inverse(x: SE3) -> SE3:
    qinv = so3.quat_conjugate(x.quat)
    return SE3(quat=qinv, trans=-so3.quat_rotate(qinv, x.trans))


def rotation_matrix(x: SE3):
    return so3.quat_to_matrix(x.quat)


def act(x: SE3, p):
    """Transform point(s) p (...,3) by x."""
    return so3.quat_rotate(x.quat, p) + x.trans


def exp(tau) -> SE3:
    """se(3) -> SE(3). tau: (...,6) [lin, ang]."""
    rho, theta = tau[..., 0:3], tau[..., 3:6]
    v = so3.left_jacobian(theta)
    return SE3(
        quat=so3.exp(theta),
        trans=jnp.einsum("...ij,...j->...i", v, rho),
    )


def log(x: SE3):
    """SE(3) -> se(3): (...,6) [lin, ang]."""
    theta = so3.log(x.quat)
    vinv = so3.left_jacobian_inv(theta)
    rho = jnp.einsum("...ij,...j->...i", vinv, x.trans)
    return jnp.concatenate([rho, theta], axis=-1)


def adjoint(x: SE3):
    """Adj(X): (...,6,6) in [lin, ang] block order: [[R, hat(t)R],[0,R]]."""
    r = so3.quat_to_matrix(x.quat)
    tr = so3.hat(x.trans) @ r
    zero = jnp.zeros_like(r)
    top = jnp.concatenate([r, tr], axis=-1)
    bot = jnp.concatenate([zero, r], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# Barfoot Q-matrix and the 6x6 group Jacobians
# ---------------------------------------------------------------------------


def _q_matrix(tau):
    """Q(rho, theta) — upper-right block of Jl_SE3 (Barfoot TRO'14 eq. 102).

    Q = 1/2 V + B(WV + VW + WVW) - C(WWV + VWW - 3WVW) - D/2 (WVWW + WWVW)
    with V = hat(rho), W = hat(theta),
    B = (th - sin th)/th^3, C = (1 - th^2/2 - cos th)/th^4, D = C - 3E,
    E = (th - sin th - th^3/6)/th^5.
    """
    rho, theta = tau[..., 0:3], tau[..., 3:6]
    theta_sq = jnp.sum(theta * theta, axis=-1)
    small = theta_sq < _SMALL_ANGLE**2
    t2 = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    t = jnp.sqrt(t2)
    st, ct = jnp.sin(t), jnp.cos(t)

    b_exact = (t - st) / (t2 * t)
    c_exact = (1.0 - 0.5 * t2 - ct) / (t2 * t2)
    e_exact = (t - st - t2 * t / 6.0) / (t2 * t2 * t)
    b_taylor = 1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0
    c_taylor = -1.0 / 24.0 + theta_sq / 720.0 - theta_sq * theta_sq / 40320.0
    e_taylor = -1.0 / 120.0 + theta_sq / 5040.0 - theta_sq * theta_sq / 362880.0

    b = jnp.where(small, b_taylor, b_exact)
    c = jnp.where(small, c_taylor, c_exact)
    e = jnp.where(small, e_taylor, e_exact)
    d = c - 3.0 * e

    v = so3.hat(rho)
    w = so3.hat(theta)
    vw = v @ w
    wv = w @ v
    wvw = wv @ w
    vww = vw @ w
    wwv = w @ wv

    b_ = b[..., None, None]
    c_ = c[..., None, None]
    d_ = d[..., None, None]
    return (
        0.5 * v
        + b_ * (wv + vw + wvw)
        - c_ * (wwv + vww - 3.0 * wvw)
        - 0.5 * d_ * (wvw @ w + w @ wvw)
    )


def _q_coeffs_du(theta_sq):
    """(db/du, dc/du, de/du) — derivatives of the _q_matrix coefficient
    functions w.r.t. u = |theta|². Same widened Taylor window as
    so3._ljac_coeffs_du (u < 0.25: the exact branches cancel ~1/u² terms)."""
    small = theta_sq < 0.25
    t2 = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    t = jnp.sqrt(t2)
    st, ct = jnp.sin(t), jnp.cos(t)
    u = theta_sq
    u2 = t2 * t2
    # b = (t-st)/t³ — identical to so3's C coefficient
    db_exact = (0.5 * (1.0 - ct) - 1.5 * (t - st) / t) / u2
    # c = (1 - u/2 - ct)/u²:  c' = (st/(2t) - 1/2)/u² - 2(1 - u/2 - ct)/u³
    c_num = 1.0 - 0.5 * t2 - ct
    dc_exact = (0.5 * st / t - 0.5) / u2 - 2.0 * c_num / (u2 * t2)
    # e = (t - st - t³/6)/t⁵:
    #   e' = ((1-ct)/(2t) - t/4)/t⁵ - (5/2)(t - st - t³/6)/t⁷
    e_num = t - st - t2 * t / 6.0
    de_exact = ((1.0 - ct) / (2.0 * t) - 0.25 * t) / (u2 * t) - 2.5 * e_num / (
        u2 * t2 * t
    )
    db_taylor = (
        -1.0 / 120.0 + u / 2520.0 - u * u / 120960.0 + u * u * u / 9979200.0
    )
    dc_taylor = (
        1.0 / 720.0 - u / 20160.0 + u * u / 1209600.0 - u * u * u / 119750400.0
    )
    de_taylor = (
        1.0 / 5040.0
        - u / 181440.0
        + u * u / 13305600.0
        - u * u * u / 1556755200.0
    )
    return (
        jnp.where(small, db_taylor, db_exact),
        jnp.where(small, dc_taylor, dc_exact),
        jnp.where(small, de_taylor, de_exact),
    )


def _q_t_jacs(tau, w):
    """Jacobians of (rho, theta) -> Q(rho, theta)ᵀ w for a fixed w:
    returns (D_rho, D_theta), each (...,3,3).

    Every Q term has the shape coeff · A(W) V B(W) with V = hat(rho),
    W = hat(theta); two rearrangement identities give closed forms:

        ∂/∂rho  [(A V B)ᵀ w] = Bᵀ hat(Aᵀ w)             (V = hat(rho))
        ∂/∂theta[(X Δ Y)ᵀ w] = Yᵀ hat(Xᵀ w)  per W slot (Δ = hat(δtheta))

    plus the coefficient derivatives (θᵀ outer products, chain through
    u = |theta|²). Verified against nested jax.jacfwd in tests/test_lie.py.
    """
    rho, theta = tau[..., 0:3], tau[..., 3:6]
    theta_sq = jnp.sum(theta * theta, axis=-1)
    small = theta_sq < _SMALL_ANGLE**2
    t2 = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    t = jnp.sqrt(t2)
    st, ct = jnp.sin(t), jnp.cos(t)
    b_exact = (t - st) / (t2 * t)
    c_exact = (1.0 - 0.5 * t2 - ct) / (t2 * t2)
    e_exact = (t - st - t2 * t / 6.0) / (t2 * t2 * t)
    b_taylor = 1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0
    c_taylor = -1.0 / 24.0 + theta_sq / 720.0 - theta_sq * theta_sq / 40320.0
    e_taylor = -1.0 / 120.0 + theta_sq / 5040.0 - theta_sq * theta_sq / 362880.0
    b = jnp.where(small, b_taylor, b_exact)[..., None, None]
    c = jnp.where(small, c_taylor, c_exact)[..., None, None]
    d = c - 3.0 * jnp.where(small, e_taylor, e_exact)[..., None, None]
    db_u, dc_u, de_u = _q_coeffs_du(theta_sq)
    dd_u = dc_u - 3.0 * de_u

    v = so3.hat(rho)
    w_m = so3.hat(theta)
    ww = w_m @ w_m
    wv = w_m @ v
    vw = v @ w_m
    wvw = wv @ w_m

    h0 = so3.hat(w)
    ww_v = jnp.einsum("...ij,...j->...i", w_m, w)  # W w
    w2w = jnp.einsum("...ij,...j->...i", ww, w)  # W² w
    vw_v = jnp.einsum("...ij,...j->...i", v, w)  # V w
    vww_v = jnp.einsum("...ij,...j->...i", vw, w)  # VW w
    wvw_v = jnp.einsum("...ij,...j->...i", wv, w)  # WV w
    wvww_v = jnp.einsum("...ij,...j->...i", wvw, w)  # WVW w
    vw2w_v = jnp.einsum("...ij,...j->...i", v @ ww, w)  # VW² w
    h1 = so3.hat(ww_v)
    h2 = so3.hat(w2w)
    p1 = so3.hat(vw_v)
    h_vw = so3.hat(vww_v)
    h_wv = so3.hat(wvw_v)
    h_wvw = so3.hat(wvww_v)
    h_vww = so3.hat(vw2w_v)

    # --- D_rho[Qᵀw]: per-term  Bᵀ hat(Aᵀ w) ---
    d_rho = (
        0.5 * h0
        + b * (-h1 - w_m @ h0 + w_m @ h1)
        - c * (h2 + ww @ h0 - 3.0 * (w_m @ h1))
        + 0.5 * d * (ww @ h1 + w_m @ h2)
    )

    # --- D_theta[Qᵀw]: W-slot replacements + coefficient derivatives ---
    mat_b = -v @ h0 - p1 + wv @ h0 + h_vw
    mat_c = vw @ h0 + v @ h1 + w_m @ p1 + h_wv - 3.0 * (wv @ h0 + h_vw)
    mat_d = (
        ww @ (v @ h0)
        + w_m @ h_vw
        + h_wvw
        + wvw @ h0
        + wv @ h1
        + h_vww
    )
    # coefficient chain:  termᵀw ⊗ (2·dcoeff/du)·thetaᵀ
    vb = vww_v + wvw_v - wvww_v  # (WV + VW + WVW)ᵀ w
    vc = (
        -jnp.einsum("...ij,...j->...i", v @ ww, w)
        - jnp.einsum("...ij,...j->...i", ww @ v, w)
        + 3.0 * wvww_v
    )  # (WWV + VWW - 3WVW)ᵀ w
    vd = jnp.einsum(
        "...ij,...j->...i", ww @ vw, w
    ) + jnp.einsum("...ij,...j->...i", w_m @ (v @ ww), w)  # (WVWW + WWVW)ᵀ w

    def outer(vec, scal2):
        return scal2[..., None, None] * vec[..., :, None] * theta[..., None, :]

    d_theta = (
        b * mat_b
        - c * mat_c
        + 0.5 * d * mat_d
        + outer(vb, 2.0 * db_u)
        - outer(vc, 2.0 * dc_u)
        - outer(vd, dd_u)
    )
    return d_rho, d_theta


def left_jacobian_t_jac(tau, w):
    """Jacobian of tau -> Jl_SE3(tau)ᵀ w for a fixed 6-cotangent w:
    (...,6) x (...,6) -> (...,6,6), [i,j] = ∂(Jlᵀw)_i/∂tau_j.

    Jl_SE3ᵀ = [[Jlθᵀ, 0], [Qᵀ, Jlθᵀ]] so rows 0:3 depend only on theta and
    rows 3:6 collect the Q and Jlθ pieces. The analytic-DDP curvature
    primitive (solver/ddp.vfxx_analytic); verified against nested
    jax.jacfwd in tests/test_lie.py."""
    rho, theta = tau[..., 0:3], tau[..., 3:6]
    w_r, w_t = w[..., 0:3], w[..., 3:6]
    top_t = so3.left_jacobian_t_jac(theta, w_r)
    dq_r, dq_t = _q_t_jacs(tau, w_r)
    bot_t = dq_t + so3.left_jacobian_t_jac(theta, w_t)
    zero = jnp.zeros_like(top_t)
    top = jnp.concatenate([zero, top_t], axis=-1)
    bot = jnp.concatenate([dq_r, bot_t], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def right_jacobian_t_jac(tau, w):
    """Jacobian of tau -> Jr_SE3(tau)ᵀ w = Jl_SE3(-tau)ᵀ w: chain rule
    gives -D[Jlᵀw](-tau)."""
    return -left_jacobian_t_jac(-tau, w)


def _block66(a, q, d):
    """Assemble [[a, q], [0, d]] from (...,3,3) blocks."""
    zero = jnp.zeros_like(a)
    top = jnp.concatenate([a, q], axis=-1)
    bot = jnp.concatenate([zero, d], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def left_jacobian(tau):
    """Jl_SE3(tau): (...,6) -> (...,6,6)."""
    theta = tau[..., 3:6]
    jl = so3.left_jacobian(theta)
    return _block66(jl, _q_matrix(tau), jl)


def right_jacobian(tau):
    """Jr_SE3(tau) = Jl_SE3(-tau)."""
    return left_jacobian(-tau)


def left_jacobian_inv(tau):
    """Jl_SE3(tau)^-1 = [[Jl^-1, -Jl^-1 Q Jl^-1], [0, Jl^-1]]."""
    theta = tau[..., 3:6]
    jlinv = so3.left_jacobian_inv(theta)
    q = _q_matrix(tau)
    return _block66(jlinv, -(jlinv @ q @ jlinv), jlinv)


def right_jacobian_inv(tau):
    """Jr_SE3(tau)^-1 = Jl_SE3(-tau)^-1."""
    return left_jacobian_inv(-tau)


# ---------------------------------------------------------------------------
# plus / minus with Jacobians (manif semantics, used by the dynamics layer)
# ---------------------------------------------------------------------------


def plus(x: SE3, tau):
    """Right-plus: x * Exp(tau). Returns the composed SE3."""
    return multiply(x, exp(tau))


def plus_jacobians(x: SE3, tau):
    """(x (+) tau, J wrt x, J wrt tau) — manif SE3::plus(t, J_x, J_t).

    J_x = Adj(Exp(tau))^-1, J_tau = Jr_SE3(tau). Reference consumes these at
    /root/reference/src/quadrotor_model.cc:183-186.
    """
    e = exp(tau)
    y = multiply(x, e)
    j_x = adjoint(inverse(e))
    j_tau = right_jacobian(tau)
    return y, j_x, j_tau


def minus(lhs: SE3, rhs: SE3):
    """Right-minus: Log(rhs^-1 * lhs): (...,6)."""
    return log(multiply(inverse(rhs), lhs))


def minus_jacobians(lhs: SE3, rhs: SE3):
    """(lhs (-) rhs, J wrt lhs, J wrt rhs) — manif SE3::minus(o, J_l, J_r).

    J_lhs = Jr_SE3(tau)^-1, J_rhs = -Jl_SE3(tau)^-1. Reference consumes these
    at /root/reference/src/quadrotor_model.cc:232-234.
    """
    tau = minus(lhs, rhs)
    return tau, right_jacobian_inv(tau), -left_jacobian_inv(tau)


def normalize(x: SE3) -> SE3:
    """Re-unitize the quaternion (guards drift over long scans)."""
    return SE3(quat=so3.quat_normalize(x.quat), trans=x.trans)
