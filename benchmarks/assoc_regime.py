"""Sequential vs associative (O(log N)) backward pass in the regime the
associative mode targets: small batch x long horizon, full solves.
Measured 2026-08-17 (v5e, B=8): N=512 351 vs 249 ms; N=1024 the f32
sequential recursion overflows to NaN while the associative pass stays
finite at 445 ms (per-combine symmetrization)."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.app import workloads
from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams
from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state, solve_batch
from quadrotorilqr_tpu.solver.options import (
    ConvergenceCriteria, ILQROptions, LineSearchParams,
)

DT = 0.02
DTYPE = jnp.float32
B = 8
params = QuadrotorParams.create(1.0, jnp.eye(3, dtype=DTYPE), 0.2, 0.016, 9.81)
q, r = workloads.demo_weights(DTYPE)
options = ILQROptions(
    line_search_params=LineSearchParams(0.5, 0.5, 20),
    convergence_criteria=ConvergenceCriteria(1e-6, 1e-6, 5),
)

for n in (512, 1024):
    i0, des = workloads.hover_to_waypoint(
        jax.random.PRNGKey(1), B, n=n, dt_s=DT, dtype=DTYPE, pose_scale=0.2
    )
    cost = QuadraticTrackingCost(
        Q=q, R=r, desired_states=des.states, desired_controls=des.controls
    )
    trajs = initial_trajectory_from_state(i0, des)
    for assoc in (False, True):
        @jax.jit
        def run(p, c, t):
            res = solve_batch(p, c, t, DT, options, associative=assoc)
            return jnp.stack(
                [jnp.sum(res.cost), jnp.mean(res.iterations.astype(jnp.float32))]
            )

        t0 = time.perf_counter()
        compiled = run.lower(params, cost, trajs).compile()
        comp = time.perf_counter() - t0
        out = np.asarray(compiled(params, cost, trajs))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = np.asarray(compiled(params, cost, trajs))
            ts.append(time.perf_counter() - t0)
        p50 = float(np.median(ts))
        print(
            f"N={n} B={B} associative={assoc}: p50 {p50*1e3:7.1f} ms  "
            f"sum_cost {out[0]:.1f} mean_iter {out[1]:.2f} (compile {comp:.0f}s)",
            flush=True,
        )
