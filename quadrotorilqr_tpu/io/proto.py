"""Proto <-> pytree converters — the equivalent of the reference's converter
layer (/root/reference/src/trajectory_to_proto.cc, ilqr_options_to_proto.cc,
ilqr_debug_to_proto.cc). The schemas are wire-compatible with the reference's
(same field numbers/types; quaternion w,x,y,z order per trajectory.proto:27-30)
so serialized results are directly comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..lie.se3 import SE3
from ..models.quadrotor import State
from ..solver.ilqr import IterDebug, Trajectory
from ..solver.options import ConvergenceCriteria, ILQROptions, LineSearchParams
from . import ilqr_debug_pb2, ilqr_options_pb2, trajectory_pb2

# ---------------------------------------------------------------------------
# Trajectory
# ---------------------------------------------------------------------------


def trajectory_to_proto(traj: Trajectory) -> trajectory_pb2.QuadrotorTrajectory:
    """trajectory_to_proto.cc:127-134 equivalent (vectorized gather, then pack)."""
    times = np.asarray(traj.times, np.float64)
    quat = np.asarray(traj.states.pose.quat, np.float64)
    trans = np.asarray(traj.states.pose.trans, np.float64)
    vel = np.asarray(traj.states.vel, np.float64)
    controls = np.asarray(traj.controls, np.float64)
    msg = trajectory_pb2.QuadrotorTrajectory()
    for i in range(times.shape[0]):
        pt = msg.points.add()
        pt.time_s = times[i]
        se3_msg = pt.state.inertial_from_body
        se3_msg.translation.c0, se3_msg.translation.c1, se3_msg.translation.c2 = trans[i]
        q = se3_msg.rotation.quaternion
        q.c0, q.c1, q.c2, q.c3 = quat[i]  # w, x, y, z
        v = pt.state.body_velocity
        v.c0, v.c1, v.c2, v.c3, v.c4, v.c5 = vel[i]
        c = pt.control
        c.c0, c.c1, c.c2, c.c3 = controls[i]
    return msg


def trajectory_from_proto(
    msg: trajectory_pb2.QuadrotorTrajectory, dtype=jnp.float64
) -> Trajectory:
    """trajectory_to_proto.cc:136-144 equivalent."""
    n = len(msg.points)
    times = np.zeros(n)
    quat = np.zeros((n, 4))
    trans = np.zeros((n, 3))
    vel = np.zeros((n, 6))
    controls = np.zeros((n, 4))
    for i, pt in enumerate(msg.points):
        times[i] = pt.time_s
        se3_msg = pt.state.inertial_from_body
        trans[i] = (se3_msg.translation.c0, se3_msg.translation.c1, se3_msg.translation.c2)
        q = se3_msg.rotation.quaternion
        quat[i] = (q.c0, q.c1, q.c2, q.c3)
        v = pt.state.body_velocity
        vel[i] = (v.c0, v.c1, v.c2, v.c3, v.c4, v.c5)
        controls[i] = (pt.control.c0, pt.control.c1, pt.control.c2, pt.control.c3)
    return Trajectory(
        times=jnp.asarray(times, dtype),
        states=State(
            pose=SE3(quat=jnp.asarray(quat, dtype), trans=jnp.asarray(trans, dtype)),
            vel=jnp.asarray(vel, dtype),
        ),
        controls=jnp.asarray(controls, dtype),
    )


# ---------------------------------------------------------------------------
# Options
# ---------------------------------------------------------------------------


def options_to_proto(options: ILQROptions) -> ilqr_options_pb2.ILQROptions:
    """NOTE: `quu_reg` is a TPU-engine extension with no field in the
    reference schema (ilqr_options.proto:17-21); it does not survive a proto
    round trip (wire compatibility with the reference takes precedence)."""
    msg = ilqr_options_pb2.ILQROptions()
    ls, cc = options.line_search_params, options.convergence_criteria
    msg.line_search_params.step_update = ls.step_update
    msg.line_search_params.desired_reduction_frac = ls.desired_reduction_frac
    msg.line_search_params.max_iters = ls.max_iters
    msg.convergence_criteria.rtol = cc.rtol
    msg.convergence_criteria.atol = cc.atol
    msg.convergence_criteria.max_iters = cc.max_iters  # double field, as reference
    msg.populate_debug = options.populate_debug
    return msg


def options_from_proto(msg: ilqr_options_pb2.ILQROptions) -> ILQROptions:
    """ilqr_options_to_proto.cc:43-47 equivalent."""
    return ILQROptions(
        line_search_params=LineSearchParams(
            step_update=msg.line_search_params.step_update,
            desired_reduction_frac=msg.line_search_params.desired_reduction_frac,
            max_iters=int(msg.line_search_params.max_iters),
        ),
        convergence_criteria=ConvergenceCriteria(
            rtol=msg.convergence_criteria.rtol,
            atol=msg.convergence_criteria.atol,
            max_iters=int(msg.convergence_criteria.max_iters),
        ),
        populate_debug=bool(msg.populate_debug),
    )


# ---------------------------------------------------------------------------
# Debug
# ---------------------------------------------------------------------------


def debug_to_proto(debug: IterDebug | None) -> ilqr_debug_pb2.QuadrotorILQRDebug:
    """ilqr_debug_to_proto.cc:24-31 equivalent; only valid slots are emitted."""
    msg = ilqr_debug_pb2.QuadrotorILQRDebug()
    if debug is None:
        return msg
    valid = np.asarray(debug.valid)
    costs = np.asarray(debug.costs, np.float64)
    for i in range(valid.shape[0]):
        if not valid[i]:
            continue
        iter_msg = msg.iter_debugs.add()
        traj_i = jax.tree.map(lambda leaf: leaf[i], debug.trajectories)
        iter_msg.trajectory.CopyFrom(trajectory_to_proto(traj_i))
        iter_msg.cost = costs[i]
    return msg


def debug_from_proto(msg: ilqr_debug_pb2.QuadrotorILQRDebug, dtype=jnp.float64):
    """Returns (list[Trajectory], list[float]) — variable-length host-side view."""
    trajs = [trajectory_from_proto(d.trajectory, dtype) for d in msg.iter_debugs]
    costs = [d.cost for d in msg.iter_debugs]
    return trajs, costs
