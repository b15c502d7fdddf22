"""Second-model-family throughput: SE(3) body-wrench iLQR on the fused
engines (kernels/models.py SE3_WRENCH — 6 controls, u=6 lane tiles).

Same protocol as bench.py's headline (hover-to-waypoint with randomized
initial poses, tol 1e-6 within a 10-iteration budget, f32, whole-solve
kernel, one packed host read per timing sample). Run on the real TPU:

    python benchmarks/wrench_bench.py

Env: QILQR_BENCH_BATCH / QILQR_BENCH_HORIZON / QILQR_BENCH_REPEATS.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost  # noqa: E402
from quadrotorilqr_tpu.lie import se3  # noqa: E402
from quadrotorilqr_tpu.models import se3_wrench as wm  # noqa: E402
from quadrotorilqr_tpu.models.quadrotor import State  # noqa: E402
from quadrotorilqr_tpu.models.se3_wrench import WrenchParams  # noqa: E402
from quadrotorilqr_tpu.parallel.batch import (  # noqa: E402
    initial_trajectory_from_state,
)
from quadrotorilqr_tpu.solver.batched import solve_batch_latency  # noqa: E402
from quadrotorilqr_tpu.solver.ilqr import Trajectory  # noqa: E402
from quadrotorilqr_tpu.solver.options import (  # noqa: E402
    ConvergenceCriteria,
    ILQROptions,
    LineSearchParams,
)

BATCH = int(os.environ.get("QILQR_BENCH_BATCH", 4096))
HORIZON = int(os.environ.get("QILQR_BENCH_HORIZON", 100))
REPEATS = int(os.environ.get("QILQR_BENCH_REPEATS", 5))
ITERS = 10
DT_S = 0.02
DTYPE = jnp.float32


def build_problem():
    params = WrenchParams.create(
        mass_kg=1.3,
        inertia=jnp.asarray(np.diag([0.4, 0.5, 0.6]) + 0.03, DTYPE),
        g_mpss=9.81,
    )
    hover = jnp.zeros((HORIZON, 6), DTYPE).at[:, 2].set(1.3 * 9.81)
    desired = Trajectory(
        times=jnp.arange(HORIZON, dtype=DTYPE) * DT_S,
        states=State(
            pose=se3.identity((HORIZON,), DTYPE),
            vel=jnp.zeros((HORIZON, 6), DTYPE),
        ),
        controls=hover,
    )
    key = jax.random.PRNGKey(0)
    x0 = State(
        pose=se3.exp(0.3 * jax.random.normal(key, (BATCH, 6), DTYPE)),
        vel=jnp.zeros((BATCH, 6), DTYPE),
    )
    cost = QuadraticTrackingCost(
        Q=jnp.asarray(np.diag([100.0] * 6 + [1.0] * 6), DTYPE),
        R=jnp.eye(6, dtype=DTYPE),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    return params, cost, initial_trajectory_from_state(x0, desired)


def main():
    params, cost, trajs = build_problem()
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-6, 1e-6, ITERS),
    )

    def bench(supertile):
        @jax.jit
        def run(p, c, t):
            result = solve_batch_latency(
                p, c, t, DT_S, options, model=wm, supertile=supertile
            )
            return jnp.stack(
                [
                    jnp.sum(result.cost),
                    jnp.mean((result.status == 1).astype(jnp.float32)),
                    jnp.mean(result.iterations.astype(jnp.float32)),
                ]
            )

        t0 = time.perf_counter()
        compiled = run.lower(params, cost, trajs).compile()
        compile_s = time.perf_counter() - t0

        def timed():
            t0 = time.perf_counter()
            packed = np.asarray(compiled(params, cost, trajs))
            return time.perf_counter() - t0, tuple(float(v) for v in packed)

        _, out = timed()  # warm-up
        times = []
        for _ in range(REPEATS):
            dt, out = timed()
            times.append(dt)
        return float(np.median(times)), compile_s, out

    # supertile row (VERDICT r4 #8): the model-generic claim must survive
    # the round-4 layout — u=6 reshapes the blocks, never forks the kernel
    p50_super, compile_super, out_super = (
        bench(True) if BATCH % 1024 == 0 else (None, None, None)
    )
    p50, compile_s, out = bench(False)
    _, frac_conv, mean_iters = out

    # speed-of-light column (VERDICT r2 #9): kernel-reported trips/probes
    # into the u=6 work model against the measured VPU peak
    from benchmarks.roofline import (
        measure_dispatch_floor_s,
        measure_vpu_peak_gflops,
        solve_flops,
    )
    from quadrotorilqr_tpu.kernels.solve import solve_fused_whole

    @jax.jit
    def stats(p, c, t):
        _, _, iters, _, probes = solve_fused_whole(
            p, c, t, DT_S, options, model=wm, return_probes=True
        )
        return jnp.stack(
            [
                jnp.mean(jnp.max(iters.reshape(-1, 128), axis=1).astype(jnp.float32)),
                jnp.mean(jnp.max(probes.reshape(-1, 128), axis=1)),
            ]
        )

    st = np.asarray(stats(params, cost, trajs))
    trips, probes = float(st[0]), float(st[1])
    vpu = measure_vpu_peak_gflops()
    floor = measure_dispatch_floor_s()
    device_s = max(p50 - floor, 1e-6)
    gflops = solve_flops(
        HORIZON, BATCH, trips, probes / max(trips, 1e-6), u_dim=6, ju_lo=6
    ) / device_s / 1e9
    pct = round(100.0 * gflops / vpu, 1)
    print(
        json.dumps(
            {
                "metric": (
                    f"iLQR solves/s/chip (SE(3) wrench, batch {BATCH}, "
                    f"horizon {HORIZON}, tol 1e-6, max {ITERS} iters)"
                ),
                "value": round(BATCH / p50, 1),
                "unit": "solves/s/chip",
                "p50_batch_latency_s": round(p50, 4),
                "compile_s": round(compile_s, 1),
                "frac_converged": frac_conv,
                "mean_iterations": round(mean_iters, 2),
                "achieved_gflops": round(gflops, 1),
                "pct_vpu_peak": pct,
                "rollouts_per_trip_measured": round(probes / max(trips, 1e-6), 2),
                "supertile_solves_per_sec": (
                    round(BATCH / p50_super, 1) if p50_super else None
                ),
                "supertile_frac_converged": (
                    out_super[1] if out_super else None
                ),
                "supertile_speedup": (
                    round(p50 / p50_super, 2) if p50_super else None
                ),
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
