"""SE(3)xR^6 quadrotor rigid-body model with analytic Jacobians — TPU-native.

Re-derivation of the reference dynamics (/root/reference/src/quadrotor_model.cc)
as pure, batch-polymorphic JAX functions over a PyTree state:

    State{pose: SE3 (quat wxyz, trans), vel: (...,6) [lin, ang]}

The 12-dim state tangent is ordered [pose_lin(0:3), pose_ang(3:6),
vel_lin(6:9), vel_ang(9:12)] — identical to the reference's StateBlocks index
map (quadrotor_model.hh:30-37). Controls are 4 rotor thrusts.

Physics (quadrotor_model.cc:65-122):
    d(pose)/dt   = body velocity v                       (as a body twist)
    dv_lin/dt    = -g R^T e_z + (sum u) e_z / m          (thrust along body z)
    dv_ang/dt    = I^-1 (moment_arms @ u - omega x (I omega))
with moment_arms = [[0,-L,0,L],[L,0,-L,0],[-k,k,-k,k]] (cc:15-18).

Discretization is a Lie-group Euler step (cc:266-277):
    x_next.pose = pose (+) dt*v,   x_next.vel = vel + dt*a
with the chain-ruled analytic Jacobian (cc:42-46):
    J_x = J_lhs + J_rhs_scaled @ J_cont_x,  J_u = J_rhs_scaled @ J_cont_u
where J_lhs/J_rhs come from the manif plus-Jacobians (cc:180-199) and
J_rhs_scaled = dt * J_rhs.

Instead of pointer-out-parameter Jacobians, every function has a plain
`..._jacobians` variant returning `(value, J_x, J_u)`; the no-Jacobian variant
stays allocation-light for rollouts. All matrices carry leading batch dims.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.linalg import chol_solve_small, chol_solve_vec

from ..lie import se3, so3
from ..lie.se3 import SE3

CONFIG_DIM = 6
STATE_DIM = 12
CONTROL_DIM = 4

# Tangent index blocks (match quadrotor_model.hh:30-37)
POSE = slice(0, 6)
POSE_LIN = slice(0, 3)
POSE_ANG = slice(3, 6)
VEL = slice(6, 12)
VEL_LIN = slice(6, 9)
VEL_ANG = slice(9, 12)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class State:
    """Quadrotor state: pose in SE(3), body velocity twist in R^6 [lin, ang]."""

    pose: SE3
    vel: jax.Array  # (..., 6)

    @property
    def batch_shape(self):
        return self.vel.shape[:-1]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class QuadrotorParams:
    """Physical parameters. Mirrors the 5 ctor args of the reference model
    (quadrotor_model.hh:7-9); all leaves may carry leading batch dims for
    per-scenario randomization."""

    mass_kg: jax.Array  # scalar (...)
    inertia: jax.Array  # (..., 3, 3) symmetric positive definite
    arm_length_m: jax.Array  # scalar (...)
    torque_to_thrust_ratio_m: jax.Array  # scalar (...)
    g_mpss: jax.Array  # scalar (...)

    @staticmethod
    def create(mass_kg, inertia, arm_length_m, torque_to_thrust_ratio_m, g_mpss=9.81, dtype=None):
        inertia = jnp.asarray(inertia, dtype=dtype)
        dtype = inertia.dtype
        return QuadrotorParams(
            mass_kg=jnp.asarray(mass_kg, dtype),
            inertia=inertia,
            arm_length_m=jnp.asarray(arm_length_m, dtype),
            torque_to_thrust_ratio_m=jnp.asarray(torque_to_thrust_ratio_m, dtype),
            g_mpss=jnp.asarray(g_mpss, dtype),
        )

    def validate(self):
        """Host-side PD check of the inertia (quadrotor_model.cc:21-24)."""
        import numpy as np

        inertia = np.asarray(self.inertia)
        if not np.allclose(inertia, np.swapaxes(inertia, -1, -2)):
            raise ValueError("Inertia matrix is not symmetric!")
        eigvals = np.linalg.eigvalsh(inertia)
        if not (eigvals > 0).all():
            raise ValueError("Inertia matrix is not positive definite!")
        return self


def moment_arms(params: QuadrotorParams):
    """(...,3,4) rotor-force -> body-torque map (quadrotor_model.cc:15-18)."""
    length = params.arm_length_m
    kappa = params.torque_to_thrust_ratio_m
    zero = jnp.zeros_like(length)
    return jnp.stack(
        [
            jnp.stack([zero, -length, zero, length], axis=-1),
            jnp.stack([length, zero, -length, zero], axis=-1),
            jnp.stack([-kappa, kappa, -kappa, kappa], axis=-1),
        ],
        axis=-2,
    )


def _inertia_solve_vec(params: QuadrotorParams, rhs):
    """I^-1 @ rhs for a vector rhs (...,3).

    The reference caches an LLT (cc:20); here an unrolled 3x3 Cholesky solve
    per call compiles to straight-line fused vector code (ops/linalg.py) —
    no factorization caching needed, and XLA CSEs repeats.
    """
    return chol_solve_vec(params.inertia, rhs)


def _inertia_solve_mat(params: QuadrotorParams, rhs):
    """I^-1 @ rhs for a matrix rhs (...,3,k)."""
    return chol_solve_small(params.inertia, rhs)


def continuous_dynamics(params: QuadrotorParams, x: State, u):
    """State time-derivative as a 12-tangent (...,12) [vel(6), accel(6)].

    Mirrors quadrotor_model.cc:65-79.
    """
    r_t_ez = so3.quat_rotate(so3.quat_conjugate(x.pose.quat), _ez(u))
    acc_lin = (
        -params.g_mpss[..., None] * r_t_ez
        + (jnp.sum(u, axis=-1) / params.mass_kg)[..., None] * _ez(u)
    )
    omega = x.vel[..., 3:6]
    torque = jnp.einsum("...ij,...j->...i", moment_arms(params), u)
    i_omega = jnp.einsum("...ij,...j->...i", params.inertia, omega)
    acc_ang = _inertia_solve_vec(params, torque - jnp.cross(omega, i_omega))
    return jnp.concatenate([x.vel, acc_lin, acc_ang], axis=-1)


def _ez(like):
    ez = jnp.zeros(3, dtype=like.dtype).at[2].set(1.0)
    return jnp.broadcast_to(ez, like.shape[:-1] + (3,))


def continuous_dynamics_jacobians(params: QuadrotorParams, x: State, u):
    """(xdot, J_x (...,12,12), J_u (...,12,4)) — analytic, cc:80-120."""
    xdot = continuous_dynamics(params, x, u)
    batch = xdot.shape[:-1]
    dtype = xdot.dtype

    j_x = jnp.zeros(batch + (STATE_DIM, STATE_DIM), dtype=dtype)
    # d(pose_dot)/d(vel) = I6   (cc:84-85)
    eye6 = jnp.broadcast_to(jnp.eye(6, dtype=dtype), batch + (6, 6))
    j_x = j_x.at[..., POSE, VEL].set(eye6)
    # d(acc_lin)/d(pose_ang) = -g hat(R^T e_z)   (cc:88-96)
    r_t_ez = so3.quat_rotate(so3.quat_conjugate(x.pose.quat), _ez(u))
    j_x = j_x.at[..., VEL_LIN, POSE_ANG].set(
        -params.g_mpss[..., None, None] * so3.hat(r_t_ez)
    )
    # d(acc_ang)/d(vel_ang) = -I^-1 (hat(w) I - hat(I w))   (cc:98-111)
    omega = x.vel[..., 3:6]
    i_omega = jnp.einsum("...ij,...j->...i", params.inertia, omega)
    j_x = j_x.at[..., VEL_ANG, VEL_ANG].set(
        -_inertia_solve_mat(params, so3.hat(omega) @ params.inertia - so3.hat(i_omega))
    )

    j_u = jnp.zeros(batch + (STATE_DIM, CONTROL_DIM), dtype=dtype)
    # thrust row: d(acc_lin_z)/du = 1/m   (cc:115-116)
    j_u = j_u.at[..., 8, :].set(
        jnp.broadcast_to((1.0 / params.mass_kg)[..., None], batch + (CONTROL_DIM,))
    )
    # d(acc_ang)/du = I^-1 moment_arms   (cc:118-119)
    j_u = j_u.at[..., VEL_ANG, :].set(
        jnp.broadcast_to(
            _inertia_solve_mat(params, moment_arms(params)), batch + (3, CONTROL_DIM)
        )
    )
    return xdot, j_x, j_u


def add(x: State, tangent):
    """State (+) 12-tangent: pose right-plus + vel add (cc:202-206)."""
    return State(
        pose=se3.plus(x.pose, tangent[..., 0:6]),
        vel=x.vel + tangent[..., 6:12],
    )


def add_jacobians(x: State, tangent):
    """(x (+) t, J_lhs, J_rhs) with the SE(3) plus-Jacobians embedded in
    identity 12x12s (cc:174-200)."""
    pose_next, j_plus_x, j_plus_t = se3.plus_jacobians(x.pose, tangent[..., 0:6])
    added = State(pose=pose_next, vel=x.vel + tangent[..., 6:12])
    batch = added.vel.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(STATE_DIM, dtype=added.vel.dtype), batch + (12, 12))
    j_lhs = eye.at[..., POSE, POSE].set(j_plus_x)
    j_rhs = eye.at[..., POSE, POSE].set(j_plus_t)
    return added, j_lhs, j_rhs


def minus(lhs: State, rhs: State):
    """State difference as a 12-tangent: [pose_lhs (-) pose_rhs, vel diff]
    (cc:215-219)."""
    return jnp.concatenate(
        [se3.minus(lhs.pose, rhs.pose), lhs.vel - rhs.vel], axis=-1
    )


def minus_jacobians(lhs: State, rhs: State):
    """(lhs (-) rhs, J_lhs, J_rhs) (cc:221-250).

    J_lhs = I12 with pose block Jr^-1(tau); J_rhs = -I12 with pose block
    -Jl^-1(tau).
    """
    tau, j_minus_lhs, j_minus_rhs = se3.minus_jacobians(lhs.pose, rhs.pose)
    diff = jnp.concatenate([tau, lhs.vel - rhs.vel], axis=-1)
    batch = diff.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(STATE_DIM, dtype=diff.dtype), batch + (12, 12))
    j_lhs = eye.at[..., POSE, POSE].set(j_minus_lhs)
    j_rhs = (-eye).at[..., POSE, POSE].set(j_minus_rhs)
    return diff, j_lhs, j_rhs


def euler_step(x: State, xdot, dt_s):
    """x (+) dt*xdot (cc:266-277, no-Jacobian path)."""
    return add(x, dt_s * xdot)


def euler_step_jacobians(x: State, xdot, dt_s):
    """(x_next, J_lhs, dt*J_rhs) (cc:270-274)."""
    x_next, j_lhs, j_rhs = add_jacobians(x, dt_s * xdot)
    return x_next, j_lhs, dt_s * j_rhs


def discrete_dynamics(params: QuadrotorParams, x: State, u, dt_s):
    """One Euler step of the continuous dynamics (cc:33-49, fast path)."""
    return euler_step(x, continuous_dynamics(params, x, u), dt_s)


def discrete_dynamics_jacobians(params: QuadrotorParams, x: State, u, dt_s):
    """(x_next, J_x (...,12,12), J_u (...,12,4)) — chain rule cc:42-46."""
    xdot, j_cont_x, j_cont_u = continuous_dynamics_jacobians(params, x, u)
    x_next, j_lhs, j_rhs = euler_step_jacobians(x, xdot, dt_s)
    j_x = j_lhs + j_rhs @ j_cont_x
    j_u = j_rhs @ j_cont_u
    return x_next, j_x, j_u


def state_identity(batch_shape=(), dtype=jnp.float32) -> State:
    return State(
        pose=se3.identity(batch_shape, dtype),
        vel=jnp.zeros(batch_shape + (6,), dtype=dtype),
    )
