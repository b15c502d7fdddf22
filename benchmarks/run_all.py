"""Benchmark suite: the five BASELINE.json configs on real hardware.

Run: python benchmarks/run_all.py [--quick]

Prints one JSON line per config and a markdown summary table. Timings use
AOT-compiled scalar-reduced wrappers synced by tiny host reads (see
.claude/skills/verify/SKILL.md for why block_until_ready is not trustworthy
under the axon TPU tunnel).
"""

from __future__ import annotations

import argparse
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

from quadrotorilqr_tpu.app import workloads  # noqa: E402
from quadrotorilqr_tpu.app.mpc import run_mpc  # noqa: E402
from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost  # noqa: E402
from quadrotorilqr_tpu.lie import se3  # noqa: E402
from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams, State  # noqa: E402
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

DTYPE = jnp.float32


def _params(dtype=DTYPE):
    return QuadrotorParams.create(
        mass_kg=1.0,
        inertia=jnp.eye(3, dtype=dtype),
        arm_length_m=0.2,
        torque_to_thrust_ratio_m=0.016,
        g_mpss=9.81,
    )


def _options(max_iters=10, tol=1e-6):
    return ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(tol, tol, max_iters),
    )


def _time(compiled, args=(), repeats=5):
    """Median wall time of a compiled fn returning ONE stacked f32 vector.

    A single packed host read syncs the device; reading K separate scalars
    would add (K-1) tunnel round trips (~28 ms each) to every sample."""
    out = tuple(np.asarray(compiled(*args)).tolist())
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = tuple(np.asarray(compiled(*args)).tolist())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out



_ROOFLINE_CEILINGS = {}


def _device_rate(solver_call, params, cost, trajs, repeats=5):
    """DEVICE seconds per batched solve by chunk-size slope
    (utils.profiling.chunk_slope — the tunnel-independent estimator,
    VERDICT r4 #4). Returns (device_s, intercept_s); device_s is None when
    the fit degenerates."""
    from dataclasses import replace as dc_replace

    from quadrotorilqr_tpu.utils.profiling import chunk_slope

    def body(carry, p, c, t, eps):
        t2 = dc_replace(t, controls=t.controls + eps * carry[0])
        res = solver_call(p, c, t2)
        return jnp.stack(
            [
                jnp.sum(res.cost),
                jnp.mean((res.status == 1).astype(jnp.float32)),
                jnp.mean(res.iterations.astype(jnp.float32)),
            ]
        )

    device_s, intercept, _ = chunk_slope(
        body, (params, cost, trajs, jnp.float32(0.0)), repeats=repeats
    )
    return device_s, intercept


def _device_fields(device_s, intercept, batch):
    """Record fields for the slope-derived device rate — self-describing
    (VERDICT r4 #4/ADVICE: a reader of the JSON alone sees the method)."""
    if device_s is None:
        return {"device_rate": None, "device_method": "chunk_slope"}
    return {
        "device_rate": round(batch / device_s, 1),
        "device_batch_latency_ms": round(device_s * 1e3, 2),
        "device_method": "chunk_slope",
        "dispatch_intercept_ms": round(intercept * 1e3, 1),
    }


def _roofline_pct(
    params, cost, trajs, dt, options, n, batch, p50, model=None,
    device_s=None, supertile=False,
):
    """Per-config speed-of-light certification (VERDICT r2 #9): achieved
    GFLOP/s from the analytic work model with the KERNEL-REPORTED trip and
    probe counts (kernels/solve.py oprob — the executed line-search
    sweeps, not an assumed 1.0), as a %% of the measured in-register FMA
    peak (~4.6 TF/s on v5e — roofline.measure_vpu_peak_gflops; the r1-r4
    records normalized to the ~1.15 TF/s VMEM-stream rate, a different
    basis). `device_s` (the chunk-slope device time) is preferred over the
    legacy p50-minus-floor subtraction. Returns (pct, gflops, ceiling) or
    (None, None, ceiling) for dispatch-floor-bound runs."""
    from benchmarks.roofline import (
        measure_dispatch_floor_s,
        measure_vpu_peak_gflops,
        solve_flops,
    )
    from quadrotorilqr_tpu.kernels.solve import solve_fused_whole

    if not _ROOFLINE_CEILINGS:
        _ROOFLINE_CEILINGS["vpu"] = measure_vpu_peak_gflops()
        _ROOFLINE_CEILINGS["floor"] = measure_dispatch_floor_s()

    @jax.jit
    def stats(p, c, t):
        _, _, iters, _, probes = solve_fused_whole(
            p, c, t, dt, options, model=model, return_probes=True
        )
        tile_iters = jnp.max(iters.reshape(-1, 128), axis=1)
        tile_probes = jnp.max(probes.reshape(-1, 128), axis=1)
        return jnp.stack(
            [
                jnp.mean(tile_iters.astype(jnp.float32)),
                jnp.mean(tile_probes),
            ]
        )

    out = np.asarray(stats(params, cost, trajs))
    trips, probes = float(out[0]), float(out[1])
    ceiling = round(_ROOFLINE_CEILINGS["vpu"], 1)
    if device_s is None:  # legacy subtraction when no slope estimate given
        device_s = p50 - _ROOFLINE_CEILINGS["floor"]
        if device_s <= 0.25 * p50:  # dispatch-floor-bound: no honest rate
            return None, None, ceiling
    flops = solve_flops(n, batch, trips, probes / max(trips, 1e-6))
    gflops = flops / device_s / 1e9
    return (
        round(100.0 * gflops / _ROOFLINE_CEILINGS["vpu"], 1),
        round(gflops, 1),
        ceiling,
    )


def config1_single_solve(quick):
    """Reference demo workload (quadrotor_ilqr.py:256-306): one solve through
    the whole-solve latency kernel (kernels/solve.py) — the full iLQR loop in
    ONE Pallas program, so wall latency is the ~28 ms tunnel dispatch floor
    plus single-digit-ms device time. tol 1e-7 is the f32 cost-resolution
    floor (rtol below ~1e-7 cannot be certified on an f32 cost of 2.3e4; the
    f64 XLA/C++ paths serve tighter parity runs)."""
    from quadrotorilqr_tpu.solver.batched import solve_batch_latency

    desired = workloads.demo_desired_trajectory(dtype=DTYPE)
    q, r = workloads.demo_weights(DTYPE)
    cost = QuadraticTrackingCost(
        Q=q, R=r, desired_states=desired.states, desired_controls=desired.controls
    )
    params = workloads.demo_params(DTYPE)
    options = _options(max_iters=100, tol=1e-7)
    trajs = jax.tree.map(lambda a: a[None], desired)  # B=1, padded to one tile

    @jax.jit
    def run(p, c, t):
        res = solve_batch_latency(p, c, t, 0.1, options)
        return jnp.stack(
            [res.cost[0], res.iterations[0].astype(DTYPE), res.status[0].astype(DTYPE)]
        )

    compiled = run.lower(params, cost, trajs).compile()
    p50, out = _time(compiled, (params, cost, trajs), repeats=3 if quick else 10)
    # wall latency here is ~95% tunnel dispatch floor; the chip-side
    # latency (the deployable number) comes from the chunk-size slope
    device_s, intercept = _device_rate(
        lambda p, c, t: solve_batch_latency(p, c, t, 0.1, options),
        params, cost, trajs, repeats=3 if quick else 10,
    )
    row = {
        "config": 1,
        "name": "reference demo workload, single solve (N=40, dt=0.1)",
        "p50_latency_ms": round(p50 * 1e3, 2),
        "value": round(1.0 / p50, 1),
        "unit": "solves/s (single scenario)",
        "final_cost": out[0],
        "iterations": out[1],
        "status": out[2],
    }
    row.update(_device_fields(device_s, intercept, 1))
    return row


def config2_hover(quick):
    batch = 256 if quick else 1024
    n = 100
    key = jax.random.PRNGKey(0)
    init_states, desired = workloads.hover_to_waypoint(
        key, batch, n=n, dt_s=0.02, dtype=DTYPE, pose_scale=0.3
    )
    q, r = workloads.demo_weights(DTYPE)
    cost = QuadraticTrackingCost(
        Q=q, R=r, desired_states=desired.states, desired_controls=desired.controls
    )
    trajs = initial_trajectory_from_state(init_states, desired)
    params = _params()
    options = _options()
    # SUPERTILE since round 5: the r4 "loses below 4 grid steps" rule was
    # a wall-number artifact — measured device-side by chunk slope, one
    # 1024-lane grid step runs 2.4x FASTER dense (232k vs 96k solves/s,
    # chunks 2/8/16, same-session)
    supertile = batch >= 1024

    @jax.jit
    def run(p, c, t):
        res = solve_batch_latency(p, c, t, 0.02, options, supertile=supertile)
        return jnp.stack(
            [
                jnp.sum(res.cost),
                jnp.mean((res.status == 1).astype(jnp.float32)),
            ]
        )

    compiled = run.lower(params, cost, trajs).compile()
    p50, out = _time(compiled, (params, cost, trajs), repeats=3 if quick else 5)
    device_s, intercept = _device_rate(
        lambda p, c, t: solve_batch_latency(
            p, c, t, 0.02, options, supertile=supertile
        ),
        params, cost, trajs, repeats=3 if quick else 5,
    )
    pct, gflops, ceiling = _roofline_pct(
        params, cost, trajs, 0.02, options, n, batch, p50,
        device_s=device_s,
    )
    row = {
        "config": 2,
        "name": f"batch-{batch} hover-to-waypoint, randomized SE(3) poses (N={n})",
        "p50_latency_ms": round(p50 * 1e3, 1),
        "value": round(batch / p50, 1),
        "unit": "solves/s/chip",
        "frac_converged": out[1],
        "pct_fma_peak": pct,
        "achieved_gflops": gflops,
        "ceiling_gflops": ceiling,
        "ceiling_basis": "fma_peak",
        "supertile": supertile,
    }
    row.update(_device_fields(device_s, intercept, batch))
    return row


def config3_figure_eight(quick):
    batch = 512 if quick else 4096
    n = 64 if quick else 200
    fig8 = workloads.figure_eight(n=n, dt_s=0.02, dtype=DTYPE)
    q, r = workloads.demo_weights(DTYPE)
    key = jax.random.PRNGKey(3)
    scale = jax.random.uniform(key, (batch,), DTYPE, 0.5, 2.0)
    cost = QuadraticTrackingCost(
        Q=scale[:, None, None] * q,  # per-scenario weights
        R=jnp.broadcast_to(r, (batch, 4, 4)),
        desired_states=fig8.states,
        desired_controls=fig8.controls,
    )
    k2 = jax.random.PRNGKey(4)
    tau = 0.2 * jax.random.normal(k2, (batch, 6), DTYPE)
    init_states = State(pose=se3.exp(tau), vel=jnp.zeros((batch, 6), DTYPE))
    trajs = initial_trajectory_from_state(init_states, fig8)
    params = _params()
    options = _options()
    # SUPERTILE since round 5 (the three-rounds-flat config, VERDICT r4
    # #3): per-scenario Q/R are stage-CONSTANT tiles, and the per-group
    # CostBatched split (kernels/backward._prep_cost) stopped them
    # promoting the DESIRED stream to per-lane layout — which is what
    # used to push N=200 past the supertile VMEM budget (the r4 compile
    # OOM at 138M/128M).
    supertile = batch >= 1024

    @jax.jit
    def run(p, c, t):
        res = solve_batch_latency(p, c, t, 0.02, options, supertile=supertile)
        return jnp.stack(
            [
                jnp.sum(res.cost),
                jnp.mean((res.status == 1).astype(jnp.float32)),
            ]
        )

    compiled = run.lower(params, cost, trajs).compile()
    p50, out = _time(compiled, (params, cost, trajs), repeats=3 if quick else 5)
    device_s, intercept = _device_rate(
        lambda p, c, t: solve_batch_latency(
            p, c, t, 0.02, options, supertile=supertile
        ),
        params, cost, trajs, repeats=3 if quick else 5,
    )
    pct, gflops, ceiling = _roofline_pct(
        params, cost, trajs, 0.02, options, n, batch, p50,
        device_s=device_s,
    )
    row = {
        "config": 3,
        "name": f"batch-{batch} figure-eight tracking, per-scenario weights (N={n})",
        "p50_latency_ms": round(p50 * 1e3, 1),
        "value": round(batch / p50, 1),
        "unit": "solves/s/chip",
        "frac_converged": out[1],
        "pct_fma_peak": pct,
        "achieved_gflops": gflops,
        "ceiling_gflops": ceiling,
        "ceiling_basis": "fma_peak",
        "supertile": supertile,
    }
    row.update(_device_fields(device_s, intercept, batch))
    return row


def config4_mpc(quick):
    batch, horizon, steps = 128, 50, 50 if quick else 100
    dt = 0.01
    n_total = steps + horizon
    desired = Trajectory(
        times=jnp.arange(n_total, dtype=DTYPE) * dt,
        states=State(
            pose=se3.identity((n_total,), DTYPE),
            vel=jnp.zeros((n_total, 6), DTYPE),
        ),
        controls=jnp.full((n_total, 4), 9.81 / 4.0, DTYPE),
    )
    q, r = workloads.demo_weights(DTYPE)
    key = jax.random.PRNGKey(0)
    tau = 0.2 * jax.random.normal(key, (batch, 6), DTYPE)
    tau = tau.at[:, 3:6].multiply(0.2)
    x0 = State(pose=se3.exp(tau), vel=jnp.zeros((batch, 6), DTYPE))
    params = _params()
    options = _options(max_iters=3, tol=1e-5)

    def make_run(n_steps):
        @jax.jit
        def run():
            out = run_mpc(
                params, q, r, desired, x0,
                n_steps=n_steps, horizon=horizon, dt_s=dt, options=options,
                latency_kernel=True,
            )
            return jnp.stack(
                [
                    jnp.sum(out["u"]),
                    jnp.mean(out["iterations"].astype(jnp.float32)),
                ]
            )

        return run.lower().compile()

    compiled = make_run(steps)
    p50, out = _time(compiled, (), repeats=3)
    per_step = p50 / steps
    # DEVICE per-tick by chunk slope (two launch sizes; the full
    # mpc_device_loop.py certification fits three) — the amortized
    # p50/steps still carries intercept/steps of tunnel overhead, which at
    # 100 ticks is a ~100% bias on a ~0.3 ms device tick
    steps_small = max(steps // 4, 1)
    p50_small, _ = _time(make_run(steps_small), (), repeats=3)
    tick_device_s = (p50 - p50_small) / max(steps - steps_small, 1)

    # host-driven single-step path: the per-dispatch latency DISTRIBUTION is
    # what certifies a control rate (a "100 Hz" claim is about p99/max, not
    # the amortized mean) — closed loop on host, one compiled step per tick,
    # only u0 read back per tick.
    from quadrotorilqr_tpu.app.mpc import mpc_step, mpc_warm_start

    warm0 = mpc_warm_start(desired, x0, horizon)

    def step_fn(x, warm, k):
        return mpc_step(
            params, q, r, desired, x, warm, k,
            horizon=horizon, dt_s=dt, options=options, latency_kernel=True,
        )

    x_c, warm_c = x0, warm0
    x_c, warm_c, u0 = step_fn(x_c, warm_c, jnp.asarray(0, jnp.int32))
    np.asarray(u0)  # warm-up + sync
    tick_times = []
    for i in range(1, steps):
        t0 = time.perf_counter()
        x_c, warm_c, u0 = step_fn(x_c, warm_c, jnp.asarray(i, jnp.int32))
        np.asarray(u0)  # the plant consumes the control here
        tick_times.append(time.perf_counter() - t0)
    tick = np.asarray(tick_times)

    return {
        "config": 4,
        "name": f"warm-started MPC, fleet of {batch}, {horizon}-step solves",
        "p50_latency_ms": round(per_step * 1e3, 3),
        "value": round(1.0 / per_step, 1),
        "unit": "control steps/s (Hz), whole fleet",
        "mean_ilqr_iters_per_step": out[1],
        # the gated, tunnel-independent fields (check_regression.py): the
        # chip-side tick cost by chunk slope; full 3-point certification
        # incl. p99 lives in benchmarks/mpc_device_loop.py
        "device_per_tick_ms": round(tick_device_s * 1e3, 3),
        "device_rate_hz": (
            round(1.0 / tick_device_s, 1) if tick_device_s > 0 else None
        ),
        "device_method": "chunk_slope",
        "per_dispatch_ms": {
            "p50": round(float(np.percentile(tick, 50)) * 1e3, 2),
            "p99": round(float(np.percentile(tick, 99)) * 1e3, 2),
            "max": round(float(tick.max()) * 1e3, 2),
        },
        "per_dispatch_hz_worst_case": round(1.0 / float(tick.max()), 1),
    }


def config5_monte_carlo(quick):
    batch = 8192 if quick else 65536
    n = 50
    key = jax.random.PRNGKey(5)
    init_states, desired = workloads.hover_to_waypoint(
        key, batch, n=n, dt_s=0.02, dtype=DTYPE, pose_scale=0.5
    )
    q, r = workloads.demo_weights(DTYPE)
    cost = QuadraticTrackingCost(
        Q=q, R=r, desired_states=desired.states, desired_controls=desired.controls
    )
    trajs = initial_trajectory_from_state(init_states, desired)
    params = _params()
    options = _options(max_iters=8)
    # supertile from one whole grid step up (the r5 re-measurement killed
    # the r4 "loses below 4 grid steps" rule — see config2)
    supertile = batch >= 1024

    @jax.jit
    def run(p, c, t):
        res = solve_batch_latency(p, c, t, 0.02, options, supertile=supertile)
        # Monte-Carlo reduction (single-chip here; multi-chip via
        # parallel.mesh.solve_sharded_fused — validated on the CPU mesh)
        return jnp.stack(
            [
                jnp.sum(res.cost),
                jnp.sum((res.status == 1).astype(jnp.float32)),
                jnp.mean(res.iterations.astype(jnp.float32)),
            ]
        )

    compiled = run.lower(params, cost, trajs).compile()
    p50, out = _time(compiled, (params, cost, trajs), repeats=3)
    device_s, intercept = _device_rate(
        lambda p, c, t: solve_batch_latency(
            p, c, t, 0.02, options, supertile=supertile
        ),
        params, cost, trajs, repeats=3,
    )
    pct, gflops, ceiling = _roofline_pct(
        params, cost, trajs, 0.02, options, n, batch, p50,
        device_s=device_s,
    )
    row = {
        "config": 5,
        "name": f"{batch}-scenario Monte-Carlo library generation (N={n})",
        "p50_latency_ms": round(p50 * 1e3, 1),
        "value": round(batch / p50, 1),
        "unit": "solves/s/chip",
        "n_converged": out[1],
        "pct_fma_peak": pct,
        "achieved_gflops": gflops,
        "ceiling_gflops": ceiling,
        "ceiling_basis": "fma_peak",
        "supertile": supertile,
    }
    row.update(_device_fields(device_s, intercept, batch))
    return row


def config6_robust(quick):
    """Robust-mode headline (round 5; NOT a BASELINE.json config — the
    reference has no robust solver to baseline against): the aggressive-
    tumble class through `solve_batch_fddp(refine="auto",
    supertile=True)` — the zero-argument production configuration
    (fddp_bench's fddp_auto_default_super row, institutionalized here so
    check_regression.py gates it round-over-round)."""
    from quadrotorilqr_tpu.solver.batched import solve_batch_fddp
    from quadrotorilqr_tpu.solver.fddp import FDDPOptions

    batch = 1024 if quick else 4096
    n = 50
    dt = 0.1  # coarse: the gyroscopic-blowup regime (fddp_bench.py)
    params = QuadrotorParams.create(
        mass_kg=1.0,
        inertia=jnp.asarray(np.diag([0.01, 0.012, 0.02]), DTYPE),
        arm_length_m=0.17,
        torque_to_thrust_ratio_m=0.016,
        g_mpss=9.81,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    scale = 1.8
    x0 = State(
        pose=se3.exp(scale * jax.random.normal(k1, (batch, 6), DTYPE)),
        vel=scale * jax.random.normal(k2, (batch, 6), DTYPE),
    )
    hover = jnp.full((n, 4), 9.81 / 4.0, DTYPE)
    desired = Trajectory(
        times=jnp.arange(n, dtype=DTYPE) * dt,
        states=State(
            pose=se3.identity((n,), DTYPE), vel=jnp.zeros((n, 6), DTYPE)
        ),
        controls=hover,
    )
    cost = QuadraticTrackingCost(
        Q=jnp.asarray(np.diag([100.0] * 6 + [1.0] * 6), DTYPE),
        R=1e-3 * jnp.eye(4, dtype=DTYPE),
        desired_states=desired.states,
        desired_controls=desired.controls,
    )
    trajs = initial_trajectory_from_state(x0, desired)
    options = _options(max_iters=40)
    # f32 feasibility floor (fddp_bench.py gap_tol note)
    fo = FDDPOptions(gap_tol=1e-5)

    def solver_call(p, c, t):
        return solve_batch_fddp(
            p, c, t, dt, options, fddp_options=fo,
            refine="auto", supertile=True,
        )

    @jax.jit
    def run(p, c, t):
        res = solver_call(p, c, t)
        return jnp.stack(
            [
                jnp.sum(res.cost),
                jnp.mean((res.status == 1).astype(jnp.float32)),
                jnp.mean(res.iterations.astype(jnp.float32)),
            ]
        )

    compiled = run.lower(params, cost, trajs).compile()
    p50, out = _time(compiled, (params, cost, trajs), repeats=3 if quick else 5)
    device_s, intercept = _device_rate(
        solver_call, params, cost, trajs, repeats=3,
    )
    row = {
        "config": 6,
        "name": (
            f"ROBUST headline: batch-{batch} aggressive-tumble "
            f"(scale {scale}, N={n}), refine='auto' supertile"
        ),
        "p50_latency_ms": round(p50 * 1e3, 1),
        "value": round(batch / p50, 1),
        "unit": "solves/s/chip",
        "frac_converged": out[1],
        "mean_iterations": round(out[2], 2),
        "supertile": True,
    }
    row.update(_device_fields(device_s, intercept, batch))
    return row


RECORD_DIR = os.path.join(os.path.dirname(__file__), "records")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller shapes")
    ap.add_argument("--configs", default="1,2,3,4,5,6")
    ap.add_argument(
        "--record",
        default=None,
        metavar="TAG",
        help="archive each config row to benchmarks/records/"
        "BENCH_cfg{K}_{TAG}.json (e.g. --record r4); "
        "benchmarks/check_regression.py gates tag-to-tag drops",
    )
    args = ap.parse_args()
    wanted = {int(x) for x in args.configs.split(",")}
    if not wanted <= {1, 2, 3, 4, 5, 6}:
        ap.error(f"--configs must be a subset of 1-6, got {sorted(wanted)}")
    if args.record:
        os.makedirs(RECORD_DIR, exist_ok=True)

    fns = {
        1: config1_single_solve,
        2: config2_hover,
        3: config3_figure_eight,
        4: config4_mpc,
        5: config5_monte_carlo,
        6: config6_robust,
    }
    rows = []
    for idx in sorted(wanted):
        t0 = time.perf_counter()
        row = fns[idx](args.quick)
        row["wall_s"] = round(time.perf_counter() - t0, 1)
        row["device"] = str(jax.devices()[0].device_kind)
        row["quick"] = bool(args.quick)
        print(json.dumps(row), flush=True)
        rows.append(row)
        if args.record:
            path = os.path.join(
                RECORD_DIR, f"BENCH_cfg{idx}_{args.record}.json"
            )
            with open(path, "w") as f:
                json.dump(row, f, indent=1)

    print("\n| # | workload | p50 latency | throughput | %VPU peak |")
    print("|---|----------|-------------|------------|-----------|")
    for r in rows:
        pct = r.get("pct_vpu_peak")
        pct_s = f"{pct}%" if pct is not None else "—"
        print(
            f"| {r['config']} | {r['name']} | {r['p50_latency_ms']} ms "
            f"| {r['value']} {r['unit']} | {pct_s} |"
        )


if __name__ == "__main__":
    main()
