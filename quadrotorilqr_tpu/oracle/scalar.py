"""Float64 NumPy scalar oracle — an independent re-derivation of the exact
reference semantics (/root/reference/src/{quadrotor_model.cc,cost.hh,ilqr.hh})
used as the correctness golden for the JAX engine (SURVEY.md §6: the baseline
must be established, not matched; the C++ itself cannot be built offline).

Deliberately written in plain NumPy with explicit Python loops and rotation
MATRICES (not quaternions) so that it shares no code path — and as little
formula structure as possible — with the JAX implementation it validates.
Matrix exponentials/logs use scipy where convenient.

Not for performance. Horizon loops are O(N) per iLQR iteration, like the C++.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def _hat(v):
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], dtype=np.float64
    )


def _so3_exp(theta):
    angle = np.linalg.norm(theta)
    w = _hat(theta)
    if angle < 1e-10:
        return np.eye(3) + w + 0.5 * (w @ w)
    return (
        np.eye(3)
        + (np.sin(angle) / angle) * w
        + ((1 - np.cos(angle)) / angle**2) * (w @ w)
    )


def _so3_log(r):
    cos_angle = np.clip((np.trace(r) - 1) / 2, -1.0, 1.0)
    angle = np.arccos(cos_angle)
    if angle < 1e-10:
        return np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]]) / 2
    if abs(np.pi - angle) < 1e-7:
        # near pi: extract axis from R + I
        m = (r + np.eye(3)) / 2
        axis = np.sqrt(np.maximum(np.diag(m), 0))
        # fix signs from off-diagonals
        if axis[0] > 0:
            axis[1] = np.copysign(axis[1], m[0, 1])
            axis[2] = np.copysign(axis[2], m[0, 2])
        elif axis[1] > 0:
            axis[2] = np.copysign(axis[2], m[1, 2])
        return angle * axis / np.linalg.norm(axis)
    return (
        angle
        / (2 * np.sin(angle))
        * np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
    )


def _so3_left_jac(theta):
    angle = np.linalg.norm(theta)
    w = _hat(theta)
    if angle < 1e-6:
        return np.eye(3) + 0.5 * w + (w @ w) / 6.0
    return (
        np.eye(3)
        + ((1 - np.cos(angle)) / angle**2) * w
        + ((angle - np.sin(angle)) / angle**3) * (w @ w)
    )


def _so3_left_jac_inv(theta):
    angle = np.linalg.norm(theta)
    w = _hat(theta)
    if angle < 1e-6:
        return np.eye(3) - 0.5 * w + (w @ w) / 12.0
    coef = 1 / angle**2 - (1 + np.cos(angle)) / (2 * angle * np.sin(angle))
    return np.eye(3) - 0.5 * w + coef * (w @ w)


def _se3_q_matrix(rho, theta):
    """Barfoot TRO'14 eq. 102 (manif fillQ)."""
    angle = np.linalg.norm(theta)
    v = _hat(rho)
    w = _hat(theta)
    if angle < 1e-6:
        b, c, e = 1 / 6 - angle**2 / 120, -1 / 24 + angle**2 / 720, -1 / 120
    else:
        b = (angle - np.sin(angle)) / angle**3
        c = (1 - angle**2 / 2 - np.cos(angle)) / angle**4
        e = (angle - np.sin(angle) - angle**3 / 6) / angle**5
    d = c - 3 * e
    wv, vw = w @ v, v @ w
    wvw = wv @ w
    return (
        0.5 * v
        + b * (wv + vw + wvw)
        - c * (w @ wv + vw @ w - 3 * wvw)
        - 0.5 * d * (wvw @ w + w @ wvw)
    )


class SE3:
    """Rotation-matrix SE(3) with manif-convention ops. Tangent [lin, ang]."""

    def __init__(self, r=None, t=None):
        self.r = np.eye(3) if r is None else np.asarray(r, np.float64)
        self.t = np.zeros(3) if t is None else np.asarray(t, np.float64)

    @staticmethod
    def exp(tau):
        rho, theta = tau[:3], tau[3:]
        return SE3(_so3_exp(theta), _so3_left_jac(theta) @ rho)

    def log(self):
        theta = _so3_log(self.r)
        return np.concatenate([_so3_left_jac_inv(theta) @ self.t, theta])

    def compose(self, other):
        return SE3(self.r @ other.r, self.t + self.r @ other.t)

    def inverse(self):
        return SE3(self.r.T, -self.r.T @ self.t)

    def adjoint(self):
        adj = np.zeros((6, 6))
        adj[:3, :3] = self.r
        adj[:3, 3:] = _hat(self.t) @ self.r
        adj[3:, 3:] = self.r
        return adj

    @staticmethod
    def right_jac(tau):
        """Jr(tau) = Jl(-tau)."""
        rho, theta = -tau[:3], -tau[3:]
        jl = _so3_left_jac(theta)
        out = np.zeros((6, 6))
        out[:3, :3] = jl
        out[:3, 3:] = _se3_q_matrix(rho, theta)
        out[3:, 3:] = jl
        return out

    @staticmethod
    def left_jac_inv(tau):
        rho, theta = tau[:3], tau[3:]
        jlinv = _so3_left_jac_inv(theta)
        q = _se3_q_matrix(rho, theta)
        out = np.zeros((6, 6))
        out[:3, :3] = jlinv
        out[:3, 3:] = -jlinv @ q @ jlinv
        out[3:, 3:] = jlinv
        return out

    @staticmethod
    def right_jac_inv(tau):
        return SE3.left_jac_inv(-tau)

    def plus(self, tau, with_jac=False):
        """X * Exp(tau); optionally (Y, J_x, J_tau) (manif plus)."""
        e = SE3.exp(tau)
        y = self.compose(e)
        if not with_jac:
            return y
        return y, e.inverse().adjoint(), SE3.right_jac(tau)

    def minus(self, other, with_jac=False):
        """Log(other^-1 * self); optionally (tau, J_lhs, J_rhs)."""
        tau = other.inverse().compose(self).log()
        if not with_jac:
            return tau
        return tau, SE3.right_jac_inv(tau), -SE3.left_jac_inv(tau)


@dataclass
class OracleState:
    pose: SE3
    vel: np.ndarray  # (6,) [lin, ang]

    def copy(self):
        return OracleState(SE3(self.pose.r.copy(), self.pose.t.copy()), self.vel.copy())


@dataclass
class OracleModel:
    """quadrotor_model.cc semantics in plain numpy."""

    mass_kg: float
    inertia: np.ndarray
    arm_length_m: float
    torque_to_thrust_ratio_m: float
    g_mpss: float = 9.81

    def __post_init__(self):
        length, kappa = self.arm_length_m, self.torque_to_thrust_ratio_m
        self.moment_arms = np.array(
            [[0, -length, 0, length], [length, 0, -length, 0], [-kappa, kappa, -kappa, kappa]],
            dtype=np.float64,
        )

    def continuous_dynamics(self, x: OracleState, u, with_jac=False):
        ez = np.array([0.0, 0.0, 1.0])
        rt_ez = x.pose.r.T @ ez
        acc_lin = -self.g_mpss * rt_ez + np.sum(u) * ez / self.mass_kg
        omega = x.vel[3:]
        torque = self.moment_arms @ u
        acc_ang = np.linalg.solve(self.inertia, torque - np.cross(omega, self.inertia @ omega))
        xdot = np.concatenate([x.vel, acc_lin, acc_ang])
        if not with_jac:
            return xdot
        j_x = np.zeros((12, 12))
        j_x[0:6, 6:12] = np.eye(6)
        j_x[6:9, 3:6] = -self.g_mpss * _hat(rt_ez)
        j_x[9:12, 9:12] = -np.linalg.solve(
            self.inertia, _hat(omega) @ self.inertia - _hat(self.inertia @ omega)
        )
        j_u = np.zeros((12, 4))
        j_u[8, :] = 1.0 / self.mass_kg
        j_u[9:12, :] = np.linalg.solve(self.inertia, self.moment_arms)
        return xdot, j_x, j_u

    @staticmethod
    def add(x: OracleState, tangent, with_jac=False):
        if not with_jac:
            return OracleState(x.pose.plus(tangent[:6]), x.vel + tangent[6:])
        pose, j_plus_x, j_plus_t = x.pose.plus(tangent[:6], with_jac=True)
        j_lhs, j_rhs = np.eye(12), np.eye(12)
        j_lhs[:6, :6] = j_plus_x
        j_rhs[:6, :6] = j_plus_t
        return OracleState(pose, x.vel + tangent[6:]), j_lhs, j_rhs

    @staticmethod
    def minus(lhs: OracleState, rhs: OracleState, with_jac=False):
        if not with_jac:
            return np.concatenate([lhs.pose.minus(rhs.pose), lhs.vel - rhs.vel])
        tau, j_m_lhs, j_m_rhs = lhs.pose.minus(rhs.pose, with_jac=True)
        j_lhs, j_rhs = np.eye(12), -np.eye(12)
        j_lhs[:6, :6] = j_m_lhs
        j_rhs[:6, :6] = j_m_rhs
        return np.concatenate([tau, lhs.vel - rhs.vel]), j_lhs, j_rhs

    def discrete_dynamics(self, x: OracleState, u, dt_s, with_jac=False):
        if not with_jac:
            return self.add(x, dt_s * self.continuous_dynamics(x, u))
        xdot, j_cont_x, j_cont_u = self.continuous_dynamics(x, u, with_jac=True)
        x_next, j_lhs, j_rhs = self.add(x, dt_s * xdot, with_jac=True)
        j_rhs = dt_s * j_rhs  # euler_step scales df/dxdot (cc:272)
        return x_next, j_lhs + j_rhs @ j_cont_x, j_rhs @ j_cont_u


@dataclass
class OracleCost:
    """cost.hh semantics (+ optional per-stage weights, the
    costs/quadratic.stage_weights extension: w_i multiplies the FULL stage
    cost and all its differentials)."""

    q: np.ndarray  # (12,12)
    r: np.ndarray  # (4,4)
    desired: list  # list[(time, OracleState, u)]
    stage_weights: np.ndarray | None = None  # (N,) or None

    def __call__(self, x, u, i, with_diffs=False):
        _, x_d, u_d = self.desired[i]
        dx, j_dx, _ = OracleModel.minus(x, x_d, with_jac=True)
        du = u - u_d
        w = 1.0 if self.stage_weights is None else float(self.stage_weights[i])
        cost = w * (dx @ self.q @ dx + du @ self.r @ du)
        if not with_diffs:
            return cost
        diffs = {
            "x": w * 2 * (dx @ self.q) @ j_dx,
            "xx": w * 2 * j_dx.T @ self.q @ j_dx,
            "u": w * 2 * du @ self.r,
            "uu": w * 2 * self.r,
            "xu": np.zeros((12, 4)),
        }
        return cost, diffs


class LineSearchError(RuntimeError):
    """Mirrors ilqr.hh:191-193."""


@dataclass
class OracleILQR:
    """ilqr.hh semantics: solve/backwards_pass/forward_sim/line_search."""

    model: OracleModel
    cost: OracleCost
    dt_s: float
    ls_step_update: float = 0.5
    ls_desired_reduction_frac: float = 0.5
    ls_max_iters: int = 100
    rtol: float = 1e-12
    atol: float = 1e-12
    max_iters: int = 100
    populate_debug: bool = False
    debug: list = field(default_factory=list)

    def cost_trajectory(self, traj):
        return sum(self.cost(x, u, i) for i, (_, x, u) in enumerate(traj))

    def backwards_pass(self, traj):
        n = len(traj)
        v_x = np.zeros(12)
        v_xx = np.zeros((12, 12))
        qutk = ktquuk = 0.0
        updates = [None] * n
        for i in range(n - 1, -1, -1):
            _, x, u = traj[i]
            _, j_x, j_u = self.model.discrete_dynamics(x, u, self.dt_s, with_jac=True)
            _, c = self.cost(x, u, i, with_diffs=True)
            q_x = c["x"] + j_x.T @ v_x
            q_u = c["u"] + j_u.T @ v_x
            q_xx = c["xx"] + j_x.T @ v_xx @ j_x
            q_uu = c["uu"] + j_u.T @ v_xx @ j_u
            q_xu = c["xu"] + j_x.T @ v_xx @ j_u
            big_k = -np.linalg.solve(q_uu, q_xu.T)
            k = -np.linalg.solve(q_uu, q_u)
            updates[i] = (k, big_k)
            v_x = q_x - big_k.T @ q_uu @ k
            v_xx = q_xx - big_k.T @ q_uu @ big_k
            qutk += q_u @ k
            ktquuk += k @ q_uu @ k
        return updates, qutk, ktquuk

    @staticmethod
    def _reduction(qutk, ktquuk, step=1.0):
        return step * qutk + step * step * ktquuk / 2.0

    def forward_sim(self, traj, updates, alpha):
        new_traj = []
        state = traj[0][1].copy()
        for i, (t, x_old, u_old) in enumerate(traj):
            k, big_k = updates[i]
            u = u_old + alpha * k + big_k @ OracleModel.minus(state, x_old)
            new_traj.append((t, state, u))
            state = self.model.discrete_dynamics(state, u, self.dt_s)
        return new_traj

    def line_search(self, traj, current_cost, updates, qutk, ktquuk):
        step = 1.0
        for _ in range(self.ls_max_iters):
            new_traj = self.forward_sim(traj, updates, step)
            new_cost = self.cost_trajectory(new_traj)
            desired = self.ls_desired_reduction_frac * self._reduction(qutk, ktquuk, step)
            if new_cost - current_cost < desired:
                return new_traj, new_cost, step
            step *= self.ls_step_update
        raise LineSearchError("Reached maximum number of line search iterations")

    def is_converged(self, cost, new_cost):
        return (
            abs(cost - new_cost) / abs(cost) < self.rtol or abs(cost - new_cost) < self.atol
        )

    def solve(self, initial_traj):
        traj = list(initial_traj)
        new_cost = self.cost_trajectory(traj)
        self.debug = []
        for i in range(self.max_iters):
            updates, qutk, ktquuk = self.backwards_pass(traj)
            cost = new_cost
            expected_new_cost = cost + self._reduction(qutk, ktquuk)
            if i > 0 and self.is_converged(cost, expected_new_cost):
                return traj, cost, i
            if i == 0:
                traj = self.forward_sim(traj, updates, 1.0)
                new_cost = self.cost_trajectory(traj)
            else:
                traj, new_cost, _ = self.line_search(traj, cost, updates, qutk, ktquuk)
            if self.populate_debug:
                self.debug.append((traj, new_cost))
            if i > 0 and self.is_converged(cost, new_cost):
                return traj, new_cost, i + 1
        return traj, new_cost, self.max_iters
