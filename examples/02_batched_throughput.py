"""Batched kernel-path solving: thousands of scenarios per dispatch.

The production pattern behind the headline numbers (BENCH_LOCAL.md):
randomized SE(3) initial poses, one `solve_batch_latency` call runs the
COMPLETE iLQR loop for every scenario as fused Pallas kernels (128-lane
tiles, float32). On CPU this example uses interpret mode; on a TPU drop
`interpret=True` for full speed.

Run: python examples/02_batched_throughput.py [--batch 128]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=128, n=20, dt_s=0.02, interpret=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quadrotorilqr_tpu.app import workloads
    from quadrotorilqr_tpu.costs import QuadraticTrackingCost
    from quadrotorilqr_tpu.parallel.batch import (
        batch_stats,
        initial_trajectory_from_state,
    )
    from quadrotorilqr_tpu.solver.batched import solve_batch_latency
    from quadrotorilqr_tpu.solver.options import ConvergenceCriteria, ILQROptions

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    init_states, desired = workloads.hover_to_waypoint(
        key, batch, n=n, dt_s=dt_s, dtype=dtype, pose_scale=0.4
    )
    q, r = workloads.demo_weights(dtype)
    cost = QuadraticTrackingCost(
        Q=q, R=r,
        desired_states=desired.states, desired_controls=desired.controls,
    )
    params = workloads.demo_params(dtype)
    trajs = initial_trajectory_from_state(init_states, desired)
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-6, 1e-6, 10)
    )

    res = solve_batch_latency(
        params, cost, trajs, dt_s, options, interpret=interpret
    )
    stats = jax.tree.map(np.asarray, batch_stats(res))
    print(f"batch: {batch}, horizon: {n}")
    print(f"converged: {100 * float(stats['frac_converged']):.1f}%")
    print(f"mean iterations: {float(np.asarray(res.iterations).mean()):.2f}")
    print(f"mean cost: {float(np.asarray(res.cost).mean()):.3f}")
    return res


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    main(batch=ap.parse_args().batch)
