"""Compare solver paths (whole-solve kernel vs batch-level loop) on the
benchmark shapes. Measured 2026-08-17 (v5e): config-3 shape 213 vs 279 ms,
config-5 shape 493 vs 894 ms — the whole-solve kernel wins at every batch
size, which is why it is the default engine (see BENCH_LOCAL.md)."""
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
from quadrotorilqr_tpu.lie import se3
from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams, State
from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
from quadrotorilqr_tpu.solver.batched import solve_batch_fused, solve_batch_latency
from quadrotorilqr_tpu.solver.options import (
    ConvergenceCriteria, ILQROptions, LineSearchParams,
)

DT = 0.02
DTYPE = jnp.float32


def bench(fn, label, params, cost, trajs, options, repeats=5):
    batch = trajs.controls.shape[0]

    @jax.jit
    def run(p, c, t):
        res = fn(p, c, t, DT, options)
        return jnp.stack(
            [
                jnp.sum(res.cost),
                jnp.mean((res.status == 1).astype(jnp.float32)),
                jnp.mean(res.iterations.astype(jnp.float32)),
            ]
        )

    t0 = time.perf_counter()
    compiled = run.lower(params, cost, trajs).compile()
    comp = time.perf_counter() - t0
    out = np.asarray(compiled(params, cost, trajs))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = np.asarray(compiled(params, cost, trajs))
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts))
    print(
        f"{label:34s} p50 {p50*1e3:7.1f} ms  {batch/p50:8.0f} solves/s  "
        f"conv {out[1]:.4f} mean_iter {out[2]:.2f} (compile {comp:.0f}s)",
        flush=True,
    )


params = QuadrotorParams.create(1.0, jnp.eye(3, dtype=DTYPE), 0.2, 0.016, 9.81)
q, r = workloads.demo_weights(DTYPE)
options = ILQROptions(
    line_search_params=LineSearchParams(0.5, 0.5, 20),
    convergence_criteria=ConvergenceCriteria(1e-6, 1e-6, 10),
)

# config-3 shape: N=200, per-scenario weights, batch 4096
batch = 4096
fig8 = workloads.figure_eight(n=200, dt_s=DT, dtype=DTYPE)
scale = jax.random.uniform(jax.random.PRNGKey(3), (batch,), DTYPE, 0.5, 2.0)
cost3 = QuadraticTrackingCost(
    Q=scale[:, None, None] * q,
    R=jnp.broadcast_to(r, (batch, 4, 4)),
    desired_states=fig8.states,
    desired_controls=fig8.controls,
)
tau = 0.2 * jax.random.normal(jax.random.PRNGKey(4), (batch, 6), DTYPE)
init3 = State(pose=se3.exp(tau), vel=jnp.zeros((batch, 6), DTYPE))
trajs3 = initial_trajectory_from_state(init3, fig8)
bench(solve_batch_fused, "config3 N=200 batch loop", params, cost3, trajs3, options)
bench(solve_batch_latency, "config3 N=200 whole-solve", params, cost3, trajs3, options)

# config-5 shape: N=50, batch 65536, 8-iter budget
batch = 65536
opt5 = ILQROptions(
    line_search_params=LineSearchParams(0.5, 0.5, 20),
    convergence_criteria=ConvergenceCriteria(1e-6, 1e-6, 8),
)
i5, d5 = workloads.hover_to_waypoint(
    jax.random.PRNGKey(5), batch, n=50, dt_s=DT, dtype=DTYPE, pose_scale=0.5
)
cost5 = QuadraticTrackingCost(
    Q=q, R=r, desired_states=d5.states, desired_controls=d5.controls
)
trajs5 = initial_trajectory_from_state(i5, d5)
bench(solve_batch_fused, "config5 N=50 B=65536 batch loop", params, cost5, trajs5, opt5, repeats=3)
bench(solve_batch_latency, "config5 N=50 B=65536 whole-solve", params, cost5, trajs5, opt5, repeats=3)
