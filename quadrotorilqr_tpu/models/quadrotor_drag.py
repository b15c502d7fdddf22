"""Quadrotor with linear aerodynamic drag — an open-protocol model family.

Real multirotors see substantial rotor/body drag (linear in body velocity
to first order); the reference model is drag-free
(/root/reference/src/quadrotor_model.cc:65-79 has only gravity, thrust and
the gyroscopic torque). This module extends the quadrotor with body-frame
linear drag on both the linear and angular velocity:

    dv_lin/dt += -(1/m) diag(drag_lin) v_lin
    dv_ang/dt += -I^-1  diag(drag_ang) v_ang

Beyond the physics, this model exercises the SOLVER's open model
protocol (every XLA path — solve / solve_batch / ddp / fddp / auglag /
box — is generic over the module protocol, the reference's `template
<class ModelT>`). Since round 3 the fused Pallas KERNELS serve it too:
the drag coupling is DIAGONAL in the body velocity, so the j_x template's
velocity block [[I3,0],[0,M]] generalizes to [[I3-dt·diag(drag_lin/m),0],
[0,M']] with M' absorbing -I⁻¹diag(drag_ang) — one (3,B) row multiply per
Riccati product, stage-constant (kernels/models.DRAG_QUADROTOR,
backward._stage_jx_blocks drag=(dl, da)). With zero drag coefficients
every function reduces EXACTLY to models/quadrotor.py (tested), and the
drag terms are linear in velocity so the analytic exact-DDP curvature is
unchanged (tests/test_ddp.py).

The control map is unchanged (affine, state-independent), so f_uu == f_ux
== 0 still holds and `solve(..., ddp=True)` remains exact for this family.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.linalg import chol_solve_small, chol_solve_vec
from .quadrotor import (  # noqa: F401  (model protocol re-exports)
    CONFIG_DIM,
    STATE_DIM,
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
from .quadrotor import QuadrotorParams, moment_arms


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DragQuadrotorParams:
    """QuadrotorParams + body-frame diagonal drag coefficients. All leaves
    may carry leading batch dims (per-scenario randomization)."""

    mass_kg: jax.Array
    inertia: jax.Array  # (..., 3, 3) SPD
    arm_length_m: jax.Array
    torque_to_thrust_ratio_m: jax.Array
    g_mpss: jax.Array
    drag_lin: jax.Array  # (..., 3) N per (m/s), body frame
    drag_ang: jax.Array  # (..., 3) N*m per (rad/s), body frame

    @staticmethod
    def create(mass_kg, inertia, arm_length_m, torque_to_thrust_ratio_m,
               drag_lin, drag_ang, g_mpss=9.81, dtype=None):
        inertia = jnp.asarray(inertia, dtype=dtype)
        dtype = inertia.dtype
        return DragQuadrotorParams(
            mass_kg=jnp.asarray(mass_kg, dtype),
            inertia=inertia,
            arm_length_m=jnp.asarray(arm_length_m, dtype),
            torque_to_thrust_ratio_m=jnp.asarray(torque_to_thrust_ratio_m, dtype),
            g_mpss=jnp.asarray(g_mpss, dtype),
            drag_lin=jnp.asarray(drag_lin, dtype),
            drag_ang=jnp.asarray(drag_ang, dtype),
        )

    def dragless(self) -> QuadrotorParams:
        """The drag-free QuadrotorParams with the same rigid body."""
        return QuadrotorParams(
            mass_kg=self.mass_kg,
            inertia=self.inertia,
            arm_length_m=self.arm_length_m,
            torque_to_thrust_ratio_m=self.torque_to_thrust_ratio_m,
            g_mpss=self.g_mpss,
        )


def continuous_dynamics(params: DragQuadrotorParams, x: State, u):
    """quadrotor_model.cc:65-79 + the drag terms of the module docstring."""
    from ..lie import so3

    v_lin = x.vel[..., 0:3]
    omega = x.vel[..., 3:6]
    r_t_ez = so3.quat_rotate(so3.quat_conjugate(x.pose.quat), _ez(u))
    acc_lin = (
        -params.g_mpss[..., None] * r_t_ez
        + (jnp.sum(u, axis=-1) / params.mass_kg)[..., None] * _ez(u)
        - params.drag_lin * v_lin / params.mass_kg[..., None]
    )
    torque = jnp.einsum("...ij,...j->...i", moment_arms(params), u)
    i_omega = jnp.einsum("...ij,...j->...i", params.inertia, omega)
    acc_ang = chol_solve_vec(
        params.inertia,
        torque - jnp.cross(omega, i_omega) - params.drag_ang * omega,
    )
    return jnp.concatenate([x.vel, acc_lin, acc_ang], axis=-1)


def continuous_dynamics_jacobians(params: DragQuadrotorParams, x: State, u):
    """Analytic Jacobians: the drag-free blocks (quadrotor_model.cc:80-120)
    plus d(acc_lin)/d(v_lin) = -diag(drag_lin)/m and the -I^-1 diag(drag_ang)
    term folded into d(acc_ang)/d(omega)."""
    from ..lie import so3

    xdot = continuous_dynamics(params, x, u)
    batch = xdot.shape[:-1]
    dtype = xdot.dtype

    j_x = jnp.zeros(batch + (STATE_DIM, STATE_DIM), dtype=dtype)
    eye6 = jnp.broadcast_to(jnp.eye(6, dtype=dtype), batch + (6, 6))
    j_x = j_x.at[..., 0:6, 6:12].set(eye6)
    r_t_ez = so3.quat_rotate(so3.quat_conjugate(x.pose.quat), _ez(u))
    j_x = j_x.at[..., 6:9, 3:6].set(
        -params.g_mpss[..., None, None] * so3.hat(r_t_ez)
    )
    # drag: the velocity block the kernel family assumes zero
    dl = params.drag_lin / params.mass_kg[..., None]
    j_x = j_x.at[..., 6:9, 6:9].set(
        -dl[..., None] * jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    )
    omega = x.vel[..., 3:6]
    i_omega = jnp.einsum("...ij,...j->...i", params.inertia, omega)
    da = jnp.zeros(batch + (3, 3), dtype).at[..., 0, 0].set(
        params.drag_ang[..., 0]
    ).at[..., 1, 1].set(params.drag_ang[..., 1]).at[..., 2, 2].set(
        params.drag_ang[..., 2]
    )
    j_x = j_x.at[..., 9:12, 9:12].set(
        -chol_solve_small(
            params.inertia,
            so3.hat(omega) @ params.inertia - so3.hat(i_omega) + da,
        )
    )

    j_u = jnp.zeros(batch + (STATE_DIM, 4), dtype=dtype)
    j_u = j_u.at[..., 8, :].set(
        jnp.broadcast_to((1.0 / params.mass_kg)[..., None], batch + (4,))
    )
    j_u = j_u.at[..., 9:12, :].set(
        jnp.broadcast_to(
            chol_solve_small(params.inertia, moment_arms(params)),
            batch + (3, 4),
        )
    )
    return xdot, j_x, j_u


def discrete_dynamics(params: DragQuadrotorParams, x: State, u, dt_s):
    return euler_step(x, continuous_dynamics(params, x, u), dt_s)


def discrete_dynamics_jacobians(params: DragQuadrotorParams, x: State, u, dt_s):
    xdot, j_cont_x, j_cont_u = continuous_dynamics_jacobians(params, x, u)
    x_next, j_lhs, j_rhs = euler_step_jacobians(x, xdot, dt_s)
    return x_next, j_lhs + j_rhs @ j_cont_x, j_rhs @ j_cont_u
