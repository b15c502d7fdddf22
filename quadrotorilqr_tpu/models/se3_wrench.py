"""Fully-actuated SE(3) rigid body with direct body-wrench control.

A second model family, demonstrating the solver layer's model-genericity:
the reference's ILQR is `template <class ModelT>` (ilqr.hh:25-32) — the
TPU-native equivalent is a module satisfying the model protocol over the
shared SE(3)xR^6 `State` (`discrete_dynamics`, `discrete_dynamics_jacobians`,
`minus`), passed to solver/ilqr.py as `model=`. The cost layer and solver
are control-dimension-agnostic, so u here is 6-dim where the quadrotor's
is 4-dim.

Control u in R^6 = [f_body (3), tau_body (3)]:

    q_dot   = v                      (config rate = body twist)
    vdot_lin = -g R^T e_z + f / m
    vdot_ang = I^-1 (tau - w x (I w))

With f = [0, 0, sum(u_rotor)] and tau = moment_arms @ u_rotor this reduces
EXACTLY to the quadrotor model (quadrotor_model.cc:65-79) — asserted in
tests/test_se3_wrench.py, which pins this model to the quadrotor one.

State-manifold arithmetic (add/minus/euler_step and their Jacobians) is
shared with the quadrotor module — it is a property of the State manifold,
not of a vehicle.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..lie import so3
from ..ops.linalg import chol_solve_small, chol_solve_vec
from .quadrotor import (  # State-manifold ops shared across models
    CONFIG_DIM,
    POSE,
    POSE_ANG,
    STATE_DIM,
    VEL,
    VEL_ANG,
    VEL_LIN,
    State,
    _ez,
    add,
    add_jacobians,
    euler_step,
    euler_step_jacobians,
    minus,
    minus_jacobians,
    state_identity,
)

CONTROL_DIM = 6


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class WrenchParams:
    """Physical parameters: mass, inertia (SPD 3x3), gravity."""

    mass_kg: jnp.ndarray
    inertia: jnp.ndarray
    g_mpss: jnp.ndarray

    @staticmethod
    def create(mass_kg, inertia, g_mpss):
        inertia = jnp.asarray(inertia)
        dtype = inertia.dtype
        return WrenchParams(
            mass_kg=jnp.asarray(mass_kg, dtype),
            inertia=inertia,
            g_mpss=jnp.asarray(g_mpss, dtype),
        )


def continuous_dynamics(params: WrenchParams, x: State, u):
    """State time-derivative as a 12-tangent (...,12) [vel(6), accel(6)]."""
    f_body = u[..., 0:3]
    tau = u[..., 3:6]
    r_t_ez = so3.quat_rotate(so3.quat_conjugate(x.pose.quat), _ez(u))
    acc_lin = (
        -params.g_mpss[..., None] * r_t_ez
        + f_body / params.mass_kg[..., None]
    )
    omega = x.vel[..., 3:6]
    i_omega = jnp.einsum("...ij,...j->...i", params.inertia, omega)
    acc_ang = chol_solve_vec(
        params.inertia, tau - jnp.cross(omega, i_omega)
    )
    return jnp.concatenate([x.vel, acc_lin, acc_ang], axis=-1)


def continuous_dynamics_jacobians(params: WrenchParams, x: State, u):
    """(xdot, J_x (...,12,12), J_u (...,12,6)) — analytic.

    J_x is identical in structure to the quadrotor's (the state coupling is
    the rigid body, not the actuation): d(pose_dot)/d(vel)=I6,
    d(acc_lin)/d(pose_ang) = -g hat(R^T e_z),
    d(acc_ang)/d(vel_ang) = -I^-1 (hat(w) I - hat(I w)). J_u is the
    full-actuation block [[0],[I3/m],[I^-1]].
    """
    xdot = continuous_dynamics(params, x, u)
    batch = xdot.shape[:-1]
    dtype = xdot.dtype

    j_x = jnp.zeros(batch + (STATE_DIM, STATE_DIM), dtype=dtype)
    eye6 = jnp.broadcast_to(jnp.eye(6, dtype=dtype), batch + (6, 6))
    j_x = j_x.at[..., POSE, VEL].set(eye6)
    r_t_ez = so3.quat_rotate(so3.quat_conjugate(x.pose.quat), _ez(u))
    j_x = j_x.at[..., VEL_LIN, POSE_ANG].set(
        -params.g_mpss[..., None, None] * so3.hat(r_t_ez)
    )
    omega = x.vel[..., 3:6]
    i_omega = jnp.einsum("...ij,...j->...i", params.inertia, omega)
    j_x = j_x.at[..., VEL_ANG, VEL_ANG].set(
        -chol_solve_small(
            params.inertia,
            so3.hat(omega) @ params.inertia - so3.hat(i_omega),
        )
    )

    j_u = jnp.zeros(batch + (STATE_DIM, CONTROL_DIM), dtype=dtype)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    j_u = j_u.at[..., VEL_LIN, 0:3].set(
        eye3 / params.mass_kg[..., None, None]
    )
    j_u = j_u.at[..., VEL_ANG, 3:6].set(
        jnp.broadcast_to(
            chol_solve_small(params.inertia, jnp.eye(3, dtype=dtype)),
            batch + (3, 3),
        )
    )
    return xdot, j_x, j_u


def discrete_dynamics(params: WrenchParams, x: State, u, dt_s):
    """One Euler step of the continuous dynamics."""
    return euler_step(x, continuous_dynamics(params, x, u), dt_s)


def discrete_dynamics_jacobians(params: WrenchParams, x: State, u, dt_s):
    """(x_next, J_x (...,12,12), J_u (...,12,6)) — same chain rule as the
    quadrotor (quadrotor_model.cc:42-46)."""
    xdot, j_cont_x, j_cont_u = continuous_dynamics_jacobians(params, x, u)
    x_next, j_lhs, j_rhs = euler_step_jacobians(x, xdot, dt_s)
    j_x = j_lhs + j_rhs @ j_cont_x
    j_u = j_rhs @ j_cont_u
    return x_next, j_x, j_u


def wrench_from_rotors(quad_params, u_rotor):
    """Map quadrotor rotor thrusts (...,4) to the equivalent body wrench
    (...,6) — the reduction that makes this model a strict generalization
    of the quadrotor (used by the cross-model parity test)."""
    from .quadrotor import moment_arms

    thrust = jnp.sum(u_rotor, axis=-1, keepdims=True)
    zeros = jnp.zeros_like(thrust)
    f_body = jnp.concatenate([zeros, zeros, thrust], axis=-1)
    tau = jnp.einsum("...ij,...j->...i", moment_arms(quad_params), u_rotor)
    return jnp.concatenate([f_body, tau], axis=-1)
