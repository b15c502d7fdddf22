"""Canonical workloads — native re-statement of the reference demo problem
(/root/reference/src/quadrotor_ilqr.py:256-292) plus the benchmark scenarios
from BASELINE.json (hover-to-waypoint, figure-eight).

All builders return stacked `Trajectory` pytrees ready for solve/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..lie import se3, so3
from ..models.quadrotor import QuadrotorParams, State
from ..solver.ilqr import Trajectory


def euler_xyz_to_quat(roll, pitch, yaw):
    """Extrinsic x-y-z Euler angles -> quaternion wxyz (scipy's "xyz" order,
    as used by the reference driver at quadrotor_ilqr.py:70)."""
    roll, pitch, yaw = (np.asarray(a, np.float64) for a in (roll, pitch, yaw))
    hr, hp, hy = roll / 2, pitch / 2, yaw / 2
    qx = np.stack([np.cos(hr), np.sin(hr), np.zeros_like(hr), np.zeros_like(hr)], -1)
    qy = np.stack([np.cos(hp), np.zeros_like(hp), np.sin(hp), np.zeros_like(hp)], -1)
    qz = np.stack([np.cos(hy), np.zeros_like(hy), np.zeros_like(hy), np.sin(hy)], -1)

    def mul(a, b):
        aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        return np.stack(
            [
                aw * bw - ax * bx - ay * by - az * bz,
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
            ],
            -1,
        )

    return mul(qz, mul(qy, qx))  # extrinsic xyz == Rz @ Ry @ Rx


def demo_desired_trajectory(dt_s=0.1, horizon_s=4.0, vel_mps=10.0, dtype=jnp.float64):
    """The reference's "climbing square" desired trajectory
    (quadrotor_ilqr.py:83-106, 256-270): four legs of a square in xy, z
    climbing 0->10, roll sweeping 0->pi, zero velocity/control targets."""
    times = np.arange(0.0, horizon_s, dt_s)
    quarter = horizon_s / 4.0
    xs, ys, zs, rolls = [], [], [], []
    for t in times:
        if t < quarter:
            x, y, z, roll = vel_mps * t, 0.0, 0.0, 0.0
        elif t < 2 * quarter:
            x, y, z, roll = vel_mps * quarter, vel_mps * (t - quarter), 10.0 / 3.0, np.pi / 3.0
        elif t < 3 * quarter:
            x, y, z, roll = (
                vel_mps * (3 * quarter - t),
                vel_mps * quarter,
                20.0 / 3.0,
                2 * np.pi / 3.0,
            )
        else:
            x, y, z, roll = 0.0, vel_mps * (4 * quarter - t), 10.0, np.pi
        xs.append(x), ys.append(y), zs.append(z), rolls.append(roll)

    n = len(times)
    quat = euler_xyz_to_quat(np.asarray(rolls), np.zeros(n), np.zeros(n))
    trans = np.stack([xs, ys, zs], axis=-1)
    states = State(
        pose=se3.SE3(quat=jnp.asarray(quat, dtype), trans=jnp.asarray(trans, dtype)),
        vel=jnp.zeros((n, 6), dtype),
    )
    return Trajectory(
        times=jnp.asarray(times, dtype),
        states=states,
        controls=jnp.zeros((n, 4), dtype),
    )


def demo_params(dtype=jnp.float64) -> QuadrotorParams:
    """quadrotor_ilqr.py:286-290."""
    return QuadrotorParams.create(
        mass_kg=1.0,
        inertia=jnp.eye(3, dtype=dtype),
        arm_length_m=1.0,
        torque_to_thrust_ratio_m=0.0,
        g_mpss=9.81,
    )


def demo_weights(dtype=jnp.float64):
    """quadrotor_ilqr.py:291-292: Q = diag(100*1_6, 1_6), R = I_4."""
    q = jnp.diag(jnp.concatenate([100.0 * jnp.ones(6, dtype), jnp.ones(6, dtype)]))
    r = jnp.eye(4, dtype=dtype)
    return q, r


def hover_to_waypoint(key, batch, n=100, dt_s=0.02, dtype=jnp.float32, pose_scale=1.0):
    """BASELINE.json config 2: randomized initial SE(3) poses, common hover
    target at the origin with hover thrust."""
    import jax

    k_pose, k_vel = jax.random.split(key)
    tau = pose_scale * jax.random.normal(k_pose, (batch, 6), dtype)
    tau = tau.at[:, 3:6].multiply(0.5)
    init_states = State(
        pose=se3.exp(tau),
        vel=0.1 * jax.random.normal(k_vel, (batch, 6), dtype),
    )
    hover_u = jnp.full((n, 4), 9.81 / 4.0, dtype)
    desired = Trajectory(
        times=jnp.arange(n, dtype=dtype) * dt_s,
        states=State(
            pose=se3.identity((n,), dtype),
            vel=jnp.zeros((n, 6), dtype),
        ),
        controls=hover_u,
    )
    return init_states, desired


def figure_eight(n=200, dt_s=0.02, radius=2.0, dtype=jnp.float32):
    """BASELINE.json config 3: figure-eight (lemniscate) tracking target."""
    t = np.arange(n) * dt_s
    omega = 2 * np.pi / (n * dt_s)
    x = radius * np.sin(omega * t)
    y = radius * np.sin(omega * t) * np.cos(omega * t)
    z = 1.0 + 0.2 * np.sin(2 * omega * t)
    trans = np.stack([x, y, z], -1)
    quat = np.zeros((n, 4))
    quat[:, 0] = 1.0
    states = State(
        pose=se3.SE3(quat=jnp.asarray(quat, dtype), trans=jnp.asarray(trans, dtype)),
        vel=jnp.zeros((n, 6), dtype),
    )
    return Trajectory(
        times=jnp.asarray(t, dtype),
        states=states,
        controls=jnp.full((n, 4), 9.81 / 4.0, dtype),
    )


def long_horizon_problem(batch, n, dtype=jnp.float32, dt_s=0.02, seed=0):
    """The canonical long-horizon benchmark/stability problem: randomized
    hover-to-waypoint scenarios with a non-trivial inertia. ONE definition
    shared by benchmarks/long_horizon.py, benchmarks/tpu_validate.py, and
    tests/test_long_horizon_f32.py so they all measure the same workload.

    Returns (params, cost, initial_trajs) with (B, N, ...) leaves.
    """
    import jax
    import numpy as np

    from ..costs.quadratic import QuadraticTrackingCost
    from ..models.quadrotor import QuadrotorParams
    from ..parallel.batch import initial_trajectory_from_state

    key = jax.random.PRNGKey(seed)
    init_states, desired = hover_to_waypoint(
        key, batch, n=n, dt_s=dt_s, dtype=dtype, pose_scale=0.4
    )
    q, r = demo_weights(dtype)
    cost = QuadraticTrackingCost(
        Q=q, R=r, desired_states=desired.states,
        desired_controls=desired.controls,
    )
    params = QuadrotorParams.create(
        mass_kg=1.3,
        inertia=jnp.asarray(np.diag([0.4, 0.5, 0.6]) + 0.05, dtype),
        arm_length_m=0.2,
        torque_to_thrust_ratio_m=0.016,
        g_mpss=9.81,
    )
    return params, cost, initial_trajectory_from_state(init_states, desired)
