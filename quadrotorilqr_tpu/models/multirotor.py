"""Generic multirotor: ANY rotor count/geometry on the SE(3)xR^6 rigid body.

The reference hard-codes one airframe — four rotors on two orthogonal arms
with alternating spin (moment_arms, /root/reference/src/quadrotor_model.cc:15-18).
This module generalizes the actuation to an arbitrary set of R rotors, each
thrusting along body +z from a body-frame position with a signed yaw-drag
coefficient:

    torque_i = r_i x (u_i e_z) + spin_i * kappa * u_i * e_z
    => moment map MA (3, R), column i = (r_i x e_z) + spin_i kappa e_z
       with r_i x e_z = (y_i, -x_i, 0)

so hexarotors, octorotors, and asymmetric airframes are all the SAME model
family: identical rigid-body drift, affine control-to-acceleration map with
a state-independent input matrix (the LaneModel family contract,
kernels/models.py) — they run on the XLA solver AND on every fused Pallas
kernel engine at full speed with only a different u_dim.

The reference quadrotor is the special case
    positions (-L,0,0), (0,-L,0), (L,0,0), (0,L,0), spins (-,+,-,+)
(reproduces quadrotor_model.cc:15-18 column for column — tested in
tests/test_multirotor.py), provided by `MultirotorParams.quadrotor`.

State/tangent layout, Lie ops, and the Euler step are SHARED with
models/quadrotor.py (the state space is the airframe-independent part).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.linalg import chol_solve_small, chol_solve_vec

# Shared state space + group ops (model protocol re-exports): the solver
# calls model.add/minus/..., which are airframe-independent.
from .quadrotor import (  # noqa: F401
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


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MultirotorParams:
    """Physical parameters for an R-rotor airframe. All leaves may carry
    leading batch dims for per-scenario randomization (the rotor COUNT is
    static; positions/spins may vary per scenario)."""

    mass_kg: jax.Array  # (...)
    inertia: jax.Array  # (..., 3, 3) SPD
    rotor_positions_m: jax.Array  # (..., R, 3) body frame
    rotor_spin: jax.Array  # (..., R) +-1 (sign of the yaw drag torque)
    torque_to_thrust_ratio_m: jax.Array  # (...)
    g_mpss: jax.Array  # (...)

    @staticmethod
    def create(
        mass_kg,
        inertia,
        rotor_positions_m,
        rotor_spin,
        torque_to_thrust_ratio_m,
        g_mpss=9.81,
        dtype=None,
    ):
        inertia = jnp.asarray(inertia, dtype=dtype)
        dtype = inertia.dtype
        return MultirotorParams(
            mass_kg=jnp.asarray(mass_kg, dtype),
            inertia=inertia,
            rotor_positions_m=jnp.asarray(rotor_positions_m, dtype),
            rotor_spin=jnp.asarray(rotor_spin, dtype),
            torque_to_thrust_ratio_m=jnp.asarray(torque_to_thrust_ratio_m, dtype),
            g_mpss=jnp.asarray(g_mpss, dtype),
        )

    @staticmethod
    def quadrotor(mass_kg, inertia, arm_length_m, torque_to_thrust_ratio_m,
                  g_mpss=9.81, dtype=None):
        """The reference airframe as a MultirotorParams (column-for-column
        equal to quadrotor_model.cc:15-18's moment_arms)."""
        length = float(arm_length_m)
        positions = [
            (-length, 0.0, 0.0),
            (0.0, -length, 0.0),
            (length, 0.0, 0.0),
            (0.0, length, 0.0),
        ]
        return MultirotorParams.create(
            mass_kg, inertia, positions, (-1.0, 1.0, -1.0, 1.0),
            torque_to_thrust_ratio_m, g_mpss, dtype,
        )

    @staticmethod
    def regular(n_rotors, mass_kg, inertia, arm_length_m,
                torque_to_thrust_ratio_m, g_mpss=9.81, phase_rad=0.0,
                dtype=None):
        """Regular planar R-rotor ring (hexarotor: n_rotors=6) with
        alternating spin."""
        import numpy as np

        ang = phase_rad + 2.0 * np.pi * np.arange(n_rotors) / n_rotors
        positions = np.stack(
            [arm_length_m * np.cos(ang), arm_length_m * np.sin(ang),
             np.zeros(n_rotors)], axis=-1,
        )
        spins = np.where(np.arange(n_rotors) % 2 == 0, -1.0, 1.0)
        return MultirotorParams.create(
            mass_kg, inertia, positions, spins, torque_to_thrust_ratio_m,
            g_mpss, dtype,
        )

    @property
    def n_rotors(self):
        return self.rotor_positions_m.shape[-2]

    def validate(self):
        """Host-side PD check of the inertia (quadrotor_model.cc:21-24
        semantics) + spin sanity."""
        import numpy as np

        inertia = np.asarray(self.inertia)
        if not np.allclose(inertia, np.swapaxes(inertia, -1, -2)):
            raise ValueError("Inertia matrix is not symmetric!")
        if not (np.linalg.eigvalsh(inertia) > 0).all():
            raise ValueError("Inertia matrix is not positive definite!")
        if not np.isin(np.asarray(self.rotor_spin), (-1.0, 1.0)).all():
            raise ValueError("rotor_spin entries must be +-1")
        return self


def moment_map(params: MultirotorParams):
    """(..., 3, R) rotor-thrust -> body-torque map (see module docstring)."""
    pos = params.rotor_positions_m
    x, y = pos[..., 0], pos[..., 1]
    kappa = params.torque_to_thrust_ratio_m
    yaw = params.rotor_spin * kappa[..., None]
    return jnp.stack([y, -x, yaw], axis=-2)


def continuous_dynamics(params: MultirotorParams, x: State, u):
    """State time-derivative as a 12-tangent (...,12) [vel(6), accel(6)] —
    the quadrotor drift (quadrotor_model.cc:65-79) with the generic moment
    map."""
    r_t_ez = _rotated_ez(x, u)
    acc_lin = (
        -params.g_mpss[..., None] * r_t_ez
        + (jnp.sum(u, axis=-1) / params.mass_kg)[..., None] * _ez(u)
    )
    omega = x.vel[..., 3:6]
    torque = jnp.einsum("...ij,...j->...i", moment_map(params), u)
    i_omega = jnp.einsum("...ij,...j->...i", params.inertia, omega)
    acc_ang = chol_solve_vec(
        params.inertia, torque - jnp.cross(omega, i_omega)
    )
    return jnp.concatenate([x.vel, acc_lin, acc_ang], axis=-1)


def _rotated_ez(x: State, like):
    from ..lie import so3

    return so3.quat_rotate(so3.quat_conjugate(x.pose.quat), _ez(like))


def continuous_dynamics_jacobians(params: MultirotorParams, x: State, u):
    """(xdot, J_x (...,12,12), J_u (...,12,R)) — analytic; the J_x blocks are
    airframe-independent (quadrotor_model.cc:80-111), J_u carries the
    generic moment map."""
    from ..lie import so3

    xdot = continuous_dynamics(params, x, u)
    batch = xdot.shape[:-1]
    dtype = xdot.dtype
    r = u.shape[-1]

    j_x = jnp.zeros(batch + (STATE_DIM, STATE_DIM), dtype=dtype)
    eye6 = jnp.broadcast_to(jnp.eye(6, dtype=dtype), batch + (6, 6))
    j_x = j_x.at[..., 0:6, 6:12].set(eye6)
    r_t_ez = _rotated_ez(x, u)
    j_x = j_x.at[..., 6:9, 3:6].set(
        -params.g_mpss[..., None, None] * so3.hat(r_t_ez)
    )
    omega = x.vel[..., 3:6]
    i_omega = jnp.einsum("...ij,...j->...i", params.inertia, omega)
    j_x = j_x.at[..., 9:12, 9:12].set(
        -chol_solve_small(
            params.inertia,
            so3.hat(omega) @ params.inertia - so3.hat(i_omega),
        )
    )

    j_u = jnp.zeros(batch + (STATE_DIM, r), dtype=dtype)
    j_u = j_u.at[..., 8, :].set(
        jnp.broadcast_to((1.0 / params.mass_kg)[..., None], batch + (r,))
    )
    j_u = j_u.at[..., 9:12, :].set(
        jnp.broadcast_to(
            chol_solve_small(params.inertia, moment_map(params)),
            batch + (3, r),
        )
    )
    return xdot, j_x, j_u


def discrete_dynamics(params: MultirotorParams, x: State, u, dt_s):
    """One Lie-Euler step (quadrotor_model.cc:33-49, fast path)."""
    return euler_step(x, continuous_dynamics(params, x, u), dt_s)


def discrete_dynamics_jacobians(params: MultirotorParams, x: State, u, dt_s):
    """(x_next, J_x, J_u (...,12,R)) — chain rule quadrotor_model.cc:42-46."""
    xdot, j_cont_x, j_cont_u = continuous_dynamics_jacobians(params, x, u)
    x_next, j_lhs, j_rhs = euler_step_jacobians(x, xdot, dt_s)
    return x_next, j_lhs + j_rhs @ j_cont_x, j_rhs @ j_cont_u
