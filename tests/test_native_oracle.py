"""Native C++ oracle (native/qilqr_oracle.cc via ctypes) vs the NumPy oracle.

The two implementations are fully independent derivations of the reference
semantics (C++ with rotation matrices vs numpy); agreement on the demo
workload to ~1e-8 is strong evidence both are right.
"""

import numpy as np
import pytest

from quadrotorilqr_tpu.app import workloads
from quadrotorilqr_tpu.oracle import native
from quadrotorilqr_tpu.oracle import scalar as orc

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native oracle failed to build"
)


def _demo_problem():
    import jax.numpy as jnp

    desired = workloads.demo_desired_trajectory(dtype=jnp.float64)
    q, r = workloads.demo_weights(jnp.float64)
    return desired, np.asarray(q), np.asarray(r)


def _to_oracle_traj(desired):
    from test_ilqr import traj_to_oracle

    return traj_to_oracle(desired)


def test_native_matches_numpy_oracle_demo_workload():
    desired, q, r = _demo_problem()

    out = native.solve(
        mass_kg=1.0,
        inertia=np.eye(3),
        arm_length_m=1.0,
        torque_to_thrust_ratio_m=0.0,
        g_mpss=9.81,
        q_mat=q,
        r_mat=r,
        desired_quat=desired.states.pose.quat,
        desired_trans=desired.states.pose.trans,
        desired_vel=desired.states.vel,
        desired_controls=desired.controls,
        init_quat=desired.states.pose.quat,
        init_trans=desired.states.pose.trans,
        init_vel=desired.states.vel,
        init_controls=desired.controls,
        dt_s=0.1,
        max_iters=100,
    )

    model = orc.OracleModel(1.0, np.eye(3), 1.0, 0.0, 9.81)
    ocost = orc.OracleCost(q, r, _to_oracle_traj(desired))
    solver = orc.OracleILQR(model, ocost, dt_s=0.1)
    o_traj, o_cost, o_iters = solver.solve(_to_oracle_traj(desired))

    assert out["iterations"] == o_iters
    np.testing.assert_allclose(out["cost"], o_cost, rtol=1e-10)
    o_controls = np.stack([u for (_, _, u) in o_traj])
    np.testing.assert_allclose(out["controls"], o_controls, atol=1e-8)
    o_trans = np.stack([s.pose.t for (_, s, _) in o_traj])
    np.testing.assert_allclose(out["trans"], o_trans, atol=1e-8)


def test_native_status_codes():
    desired, q, r = _demo_problem()
    # absurd tolerance + tiny iteration budget -> max_iters status (0)
    out = native.solve(
        mass_kg=1.0, inertia=np.eye(3), arm_length_m=1.0,
        torque_to_thrust_ratio_m=0.0, g_mpss=9.81, q_mat=q, r_mat=r,
        desired_quat=desired.states.pose.quat,
        desired_trans=desired.states.pose.trans,
        desired_vel=desired.states.vel,
        desired_controls=desired.controls,
        init_quat=desired.states.pose.quat,
        init_trans=desired.states.pose.trans,
        init_vel=desired.states.vel,
        init_controls=desired.controls,
        dt_s=0.1, rtol=0.0, atol=0.0, max_iters=2,
    )
    assert out["status"] in (0, 2)
    assert out["iterations"] == 2
