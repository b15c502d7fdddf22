"""Drop-in use of the reference API: proto in, proto out.

Mirrors the reference driver's usage (/root/reference/src/quadrotor_ilqr.py:
286-306): construct `QuadrotorILQR` with the same ten arguments, call
`solve` on a trajectory proto, get (optimized trajectory proto, debug
proto) back. A reference user switches by changing one import.

Run: python examples/01_reference_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)


def main(n=12, dt_s=0.1, max_iters=50):
    import jax.numpy as jnp

    from quadrotorilqr_tpu.api import QuadrotorILQR
    from quadrotorilqr_tpu.app import workloads
    from quadrotorilqr_tpu.io import trajectory_to_proto
    from quadrotorilqr_tpu.solver.options import (
        ConvergenceCriteria,
        ILQROptions,
        LineSearchParams,
    )

    desired = workloads.demo_desired_trajectory(dt_s=dt_s, horizon_s=n * dt_s)
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 100),
        convergence_criteria=ConvergenceCriteria(1e-9, 1e-9, max_iters),
        populate_debug=True,
    )
    ilqr = QuadrotorILQR(
        1.0,                        # mass_kg
        jnp.eye(3, dtype=jnp.float64),  # inertia
        1.0,                        # arm_length_m
        0.0,                        # torque_to_thrust_ratio_m
        9.81,                       # g_mpss
        np.diag([100.0] * 6 + [1.0] * 6),  # Q
        np.eye(4),                  # R
        desired,                    # desired trajectory (pytree or proto)
        dt_s,
        options,
    )
    initial = trajectory_to_proto(desired)  # infeasible start, like the demo
    opt_traj_proto, debug_proto = ilqr.solve(initial)
    print(f"stages: {len(opt_traj_proto.points)}")
    print(f"iterations recorded in debug: {len(debug_proto.iter_debugs)}")
    print(f"final cost: {debug_proto.iter_debugs[-1].cost:.6f}")
    return opt_traj_proto, debug_proto


if __name__ == "__main__":
    main()
