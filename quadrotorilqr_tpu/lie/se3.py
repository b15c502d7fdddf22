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
