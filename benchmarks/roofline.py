"""Speed-of-light accounting for the fused iLQR kernels.

Three ingredients, combined into a roofline argument (BASELINE.json north
star: "rollout and backward-pass kernels at speed-of-light per chip"):

1. ANALYTIC work: FLOPs per solver stage, counted by walking the jaxpr of
   the exact lane-layout stage functions the kernels execute
   (kernels/backward._riccati_stage, kernels/rollout stage math) at lane
   width 1 — no hand-counting drift: the count tracks the code.
2. MEASURED machine ceilings on THIS chip: f32 VPU FMA throughput and HBM
   copy bandwidth via micro-kernels, plus the host<->device dispatch floor
   of the tunnel (timed empty program) so device time can be separated
   from wall time.
3. ACHIEVED rates from the benchmark runs: analytic FLOPs / device-seconds
   vs the measured ceilings, and streamed HBM bytes / device-seconds vs
   measured bandwidth — whichever ratio is higher is the binding bound.

Run: python benchmarks/roofline.py  (TPU; prints a JSON report)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# per-element FLOP weights by primitive; transcendentals counted as multiple
# flops (VPU evaluates them as polynomial sequences)
_ELEMENTWISE = {
    "add": 1, "sub": 1, "mul": 1, "div": 1, "neg": 1, "max": 1, "min": 1,
    "abs": 1, "select_n": 1, "pow": 4, "integer_pow": 2, "sqrt": 1,
    "rsqrt": 1, "sin": 8, "cos": 8, "tan": 10, "atan2": 12, "asin": 10,
    "acos": 10, "exp": 8, "log": 8, "logistic": 8, "tanh": 8, "sign": 1,
    "floor": 1, "round": 1, "erf": 10, "square": 1, "cbrt": 2,
}


def count_flops(fn, *args):
    """FLOPs of one call of `fn(*args)` by jaxpr walk (handles nested
    pjit/closed calls and dot_general; comparisons/layout ops are free)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    return _count_jaxpr(jaxpr.jaxpr)


def _count_jaxpr(jaxpr):
    total = 0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim in ("pjit", "closed_call", "custom_jvp_call", "custom_vjp_call"):
            inner = eqn.params.get("jaxpr")
            if inner is not None:
                total += _count_jaxpr(inner.jaxpr if hasattr(inner, "jaxpr") else inner)
            continue
        if prim in ("scan", "while", "cond"):
            raise ValueError(f"count_flops: unroll control flow first ({prim})")
        if prim == "dot_general":
            a, b = eqn.invars[0].aval, eqn.invars[1].aval
            ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
            k = int(np.prod([a.shape[d] for d in lc])) or 1
            bsz = int(np.prod([a.shape[d] for d in lb])) or 1
            m = int(np.prod([a.shape[d] for d in range(a.ndim) if d not in (*lc, *lb)])) or 1
            n = int(np.prod([b.shape[d] for d in range(b.ndim) if d not in (*rc, *rb)])) or 1
            total += 2 * bsz * m * n * k
            continue
        if prim == "reduce_sum":
            total += int(np.prod(eqn.invars[0].aval.shape))
            continue
        w = _ELEMENTWISE.get(prim)
        if w:
            out = eqn.outvars[0].aval
            total += w * int(np.prod(out.shape)) if out.shape else w
    return total


# ---------------------------------------------------------------------------
# analytic per-stage work of the fused kernels (lane width 1)
# ---------------------------------------------------------------------------


def backward_stage_flops(dtype=jnp.float32, u_dim=4, ju_lo=8) -> int:
    """FLOPs per lane per horizon stage of the Riccati backward kernel
    (u_dim/ju_lo parametrize the model family: quadrotor 4/8, wrench 6/6)."""
    from quadrotorilqr_tpu.kernels import lanes as L
    from quadrotorilqr_tpu.kernels.backward import _riccati_stage

    b = 1
    z = lambda *s: jnp.zeros(s + (b,), dtype)

    def stage(quat, trans, vel, u, dq, dtr, dv, du, q_l, r2_l, g, ju, i_l, iinv_l, v_x, v_xx):
        return _riccati_stage(
            0.1, 0.0, q_l, r2_l, g, ju, L.transpose(ju), i_l, iinv_l,
            quat, trans, vel, u, dq, dtr, dv, du, v_x, v_xx,
            ju_lo_row=ju_lo,
        )

    return count_flops(
        stage,
        z(4), z(3), z(6), z(u_dim), z(4), z(3), z(6), z(u_dim),
        z(12, 12), z(u_dim, u_dim), z(1, 1), z(12, u_dim), z(3, 3), z(3, 3),
        z(12), z(12, 12),
    )


def rollout_stage_flops(dtype=jnp.float32) -> int:
    """FLOPs per lane per stage of the rollout+cost kernel (feedback control
    update + stage cost + dynamics step)."""
    from quadrotorilqr_tpu.kernels import lanes as L
    from quadrotorilqr_tpu.kernels.rollout import _dynamics_step, _state_minus

    b = 1
    z = lambda *s: jnp.zeros(s + (b,), dtype)

    def stage(quat, trans, vel, oq, ot, ov, ou, k, big_k, alpha, dq, dtr, dv, du,
              q_l, r_l, g, m_inv, iinv_ma, i_l, iinv_l, ez):
        dx = _state_minus(quat, trans, vel, oq, ot, ov)
        u = ou + alpha * k + L.matvec(big_k, dx)
        dxd = _state_minus(quat, trans, vel, dq, dtr, dv)
        duv = u - du
        c = L.dot_lanes(dxd, L.matvec(q_l, dxd)) + L.dot_lanes(duv, L.matvec(r_l, duv))
        nxt = _dynamics_step(0.1, g, m_inv, iinv_ma, i_l, iinv_l, ez, quat, trans, vel, u)
        return c, u, nxt

    return count_flops(
        stage,
        z(4), z(3), z(6), z(4), z(3), z(6), z(4), z(4), z(4, 12), z(1),
        z(4), z(3), z(6), z(4), z(12, 12), z(4, 4), z(1), z(1), z(3, 4),
        z(3, 3), z(3, 3), z(3),
    )


def fddp_defect_stage_flops(dtype=jnp.float32) -> int:
    """FLOPs per lane per stage of the FDDP defects sweep (dynamics step +
    state minus + gap max; kernels/fddp.py dstage)."""
    from quadrotorilqr_tpu.kernels.rollout import _dynamics_step, _state_minus

    b = 1
    z = lambda *s: jnp.zeros(s + (b,), dtype)

    def stage(quat, trans, vel, u, nq, nt, nv, g, m_inv, iinv_ma, i_l, iinv_l, ez):
        q2, t2, v2 = _dynamics_step(
            0.1, g, m_inv, iinv_ma, i_l, iinv_l, ez, quat, trans, vel, u
        )
        d = _state_minus(q2, t2, v2, nq, nt, nv)
        return d, jnp.max(jnp.abs(d), axis=0, keepdims=True)

    return count_flops(
        stage,
        z(4), z(3), z(6), z(4), z(4), z(3), z(6),
        z(1), z(1), z(3, 4), z(3, 3), z(3, 3), z(3),
    )


def fddp_model_stage_flops(dtype=jnp.float32) -> int:
    """FLOPs per lane per stage of the FDDP exact quadratic line-search
    model (kernels/fddp.py qmstage: jacobian blocks + cost diffs + the
    p/L1/L2 recursion)."""
    from quadrotorilqr_tpu.kernels import lanes as L
    from quadrotorilqr_tpu.kernels.backward import (
        _jx_vec,
        _stage_cost_diffs,
        _stage_jx_blocks,
    )

    b = 1
    z = lambda *s: jnp.zeros(s + (b,), dtype)

    def stage(quat, trans, vel, u, dq, dtr, dv, du_d, q_l, r2_l, g, ju,
              i_l, iinv_l, p, k, big_k, d):
        blocks = _stage_jx_blocks(0.1, g, vel, quat, i_l, iinv_l)
        _, c_x, c_xx, du = _stage_cost_diffs(
            quat, trans, vel, u, dq, dtr, dv, du_d, q_l
        )
        c_u = L.matvec(r2_l, du)
        wv = k + L.matvec(big_k, p)
        l1 = L.dot_lanes(c_x, p) + L.dot_lanes(c_u, wv)
        l2 = 0.5 * (
            L.dot_lanes(p, L.matvec(c_xx, p))
            + L.dot_lanes(wv, L.matvec(r2_l, wv))
        )
        p2 = _jx_vec(p, *blocks)
        p2 = jnp.concatenate([p2[0:8], p2[8:12] + L.matvec(ju[8:12], wv)], axis=0)
        return p2 + d, l1, l2

    return count_flops(
        stage,
        z(4), z(3), z(6), z(4), z(4), z(3), z(6), z(4),
        z(12, 12), z(4, 4), z(1, 1), z(12, 4), z(3, 3), z(3, 3),
        z(12), z(4), z(4, 12), z(12),
    )


def fddp_solve_flops(n, batch, trips, rollouts_per_trip=1.0) -> float:
    """Analytic FLOPs of a batched FDDP kernel solve: per trip the defects
    (fused into the backward sweep since round 3; recomputed on accepted
    trips — counted fully, a slight overcount on reject-heavy workloads) +
    the gap-transported backward (riccati stage + the 12x12 v_xx@d
    transport matvec, 288 FLOPs) + ONE quadratic-model evaluation (fused
    into line-search probe 0) + `rollouts_per_trip` gap-contracting
    rollouts (rollout stage + ~300 FLOPs for the se3 exp+compose
    contraction). Since round 3 the kernel REPORTS its executed probe
    sweeps (solve_fddp_fused return_probes), so rollouts_per_trip is
    MEASURED — the round-2 report assumed 1.0 and undercounted the
    executed work by ~5x on backtracking-heavy workloads, which is what
    made the kernel look 3x less efficient than it is."""
    transport = 288  # v_xx @ d per stage (12x12 matvec, mul+add)
    contraction = 300  # -(1-a)d scale + se3_exp(6) + compose + vel add
    per_stage = (
        fddp_defect_stage_flops()
        + backward_stage_flops() + transport
        + fddp_model_stage_flops()
        + rollouts_per_trip * (rollout_stage_flops() + contraction)
    )
    return float(trips) * batch * n * per_stage


def solve_flops(n, batch, trips, rollouts_per_trip=1.0, u_dim=4, ju_lo=8) -> float:
    """Analytic FLOPs of a batched fused solve: every global outer trip runs
    the backward kernel plus `rollouts_per_trip` rollout kernels over the
    FULL batch and horizon (lanes that already converged still occupy their
    tile — that is the masked-batch cost model)."""
    per_stage = backward_stage_flops(
        u_dim=u_dim, ju_lo=ju_lo
    ) + rollouts_per_trip * rollout_stage_flops()
    return float(trips) * batch * n * per_stage


def solve_hbm_bytes(n, batch, trips, rollouts_per_trip=1.0, dtype_bytes=4) -> float:
    """HBM bytes streamed per solve: per trip the backward kernel reads the
    trajectory (17N) + desired (17N) and writes gains (4N + 48N); each
    rollout reads trajectory+desired+gains and writes a trajectory."""
    traj = 17 * n
    gains = 52 * n
    backward = (2 * traj + gains) * dtype_bytes
    rollout = (2 * traj + gains + traj) * dtype_bytes
    return float(trips) * batch * (backward + rollouts_per_trip * rollout)


# ---------------------------------------------------------------------------
# measured machine ceilings
# ---------------------------------------------------------------------------


def _time_compiled(compiled, args, repeats=5):
    out = np.asarray(compiled(*args))  # warm-up + sync
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = np.asarray(compiled(*args))
        ts.append(time.perf_counter() - t0)
    del out
    return float(np.median(ts))


def measure_dispatch_floor_s(repeats=10) -> float:
    """Wall time of an (almost) empty device program + one tiny host read —
    the per-call overhead every latency number contains."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((4,), jnp.float32)
    compiled = f.lower(x).compile()
    return _time_compiled(compiled, (x,), repeats)


def measure_vpu_peak_gflops(iters=800, shape=(2048, 512), chains=4,
                            depth=32) -> float:
    """f32 VPU FMA ceiling: `chains` independent chains, each applying
    `depth` dependent in-register FMAs per element per loop iteration
    (2*chains*depth flops per element touch). Timed minus dispatch floor;
    `iters` sized so compute (~30-60 ms) dominates the ~25 ms floor.

    depth matters: at depth=1 (the rounds-1..3 micro-kernel) each FMA
    pairs with a VMEM read+write of the loop carry, measuring a
    VMEM-STREAM-bound ~1.1-1.2 TF/s, NOT the FMA unit — the round-4
    supertile kernels sustained 2.25 TF/s against it (BENCH_LOCAL.md).
    Deep in-register chains measure the unit itself: on v5e, 3.7 TF/s at
    depth=8 rising to ~4.6 TF/s at depth=32 (measured 2026-08-20). Use
    measure_vmem_fma_gflops for the streaming ceiling, which is the
    binding one for code at ~1 flop/element-touch."""
    a = jnp.float32(1.000001)

    @jax.jit
    def burn(y):
        ys = tuple(y + jnp.float32(i) for i in range(chains))

        def body(_, ys):
            out = []
            for v in ys:
                for _ in range(depth):
                    v = v * a + jnp.float32(1e-7)
                out.append(v)
            return tuple(out)

        ys = jax.lax.fori_loop(0, iters, body, ys)
        acc = ys[0]
        for v in ys[1:]:
            acc = acc + v
        return jnp.sum(acc[:1, :1])

    y = jnp.ones(shape, jnp.float32)
    compiled = burn.lower(y).compile()
    t = _time_compiled(compiled, (y,)) - measure_dispatch_floor_s()
    flops = 2.0 * chains * depth * iters * shape[0] * shape[1]
    return flops / max(t, 1e-9) / 1e9


def measure_vmem_fma_gflops(iters=6000, shape=(2048, 512), chains=4) -> float:
    """f32 FMA rate at ONE flop-pair per element touch (depth=1): each
    loop iteration streams every chain's block through VMEM around a
    single FMA. This is the rounds-1..3 "VPU peak" (~1.1-1.2 TF/s on
    v5e) — kept as the STREAMING ceiling, the binding roofline for code
    whose register-level arithmetic intensity is ~1 (sweeping chains
    4..32 does not raise it; 32 spills and drops to ~0.66 TF/s)."""
    return measure_vpu_peak_gflops(iters=iters, shape=shape, chains=chains,
                                   depth=1)


def measure_hbm_bw_gbs(mb=512, sweeps=8, repeats=5) -> float:
    """Achievable HBM stream bandwidth: `sweeps` chained y = y + 1 passes
    over an HBM-sized array, each separated by an optimization_barrier so
    every pass materializes (read n + write n bytes; without the barriers
    XLA folds the adds into one pass). Total traffic ~8 GB so the transfer
    time dwarfs the ~25 ms dispatch floor."""
    n = mb * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def stream(x):
        y = x
        for _ in range(sweeps):
            y = jax.lax.optimization_barrier(y + 1.0)
        return jnp.sum(y[:8])

    compiled = stream.lower(x).compile()
    t = _time_compiled(compiled, (x,), repeats) - measure_dispatch_floor_s()
    return 2.0 * sweeps * n * 4 / max(t, 1e-9) / 1e9


# ---------------------------------------------------------------------------
# report
# ---------------------------------------------------------------------------


def roofline_report(n, batch, trips, device_s, rollouts_per_trip=1.0,
                    vpu_peak_gflops=None, hbm_bw_gbs=None) -> dict:
    """Achieved vs ceiling rates for one measured fused solve."""
    flops = solve_flops(n, batch, trips, rollouts_per_trip)
    bytes_ = solve_hbm_bytes(n, batch, trips, rollouts_per_trip)
    achieved_gflops = flops / device_s / 1e9
    achieved_gbs = bytes_ / device_s / 1e9
    rep = {
        "analytic_flops_per_solve": flops / batch,
        "analytic_hbm_bytes_per_solve": bytes_ / batch,
        "backward_stage_flops_per_lane": backward_stage_flops(),
        "rollout_stage_flops_per_lane": rollout_stage_flops(),
        "achieved_gflops": round(achieved_gflops, 1),
        "achieved_hbm_gbs": round(achieved_gbs, 1),
    }
    if vpu_peak_gflops:
        rep["vpu_peak_gflops_measured"] = round(vpu_peak_gflops, 1)
        rep["pct_vpu_peak"] = round(100 * achieved_gflops / vpu_peak_gflops, 1)
    if hbm_bw_gbs:
        rep["hbm_bw_gbs_measured"] = round(hbm_bw_gbs, 1)
        rep["pct_hbm_bw"] = round(100 * achieved_gbs / hbm_bw_gbs, 1)
    if vpu_peak_gflops and hbm_bw_gbs:
        rep["binding_bound"] = (
            "compute (VPU)"
            if rep["pct_vpu_peak"] >= rep["pct_hbm_bw"]
            else "memory (HBM)"
        )
    return rep


def main():
    from quadrotorilqr_tpu.app import workloads
    from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost
    from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams
    from quadrotorilqr_tpu.parallel.batch import initial_trajectory_from_state
    from quadrotorilqr_tpu.solver.batched import solve_batch_latency
    from quadrotorilqr_tpu.solver.options import (
        ConvergenceCriteria, ILQROptions, LineSearchParams,
    )

    batch, n, iters = 4096, 100, 10
    dt = 0.02
    key = jax.random.PRNGKey(0)
    init_states, desired = workloads.hover_to_waypoint(
        key, batch, n=n, dt_s=dt, dtype=jnp.float32, pose_scale=0.3
    )
    q, r = workloads.demo_weights(jnp.float32)
    cost = QuadraticTrackingCost(
        Q=q, R=r, desired_states=desired.states, desired_controls=desired.controls
    )
    params = QuadrotorParams.create(1.0, jnp.eye(3, dtype=jnp.float32), 0.2, 0.016, 9.81)
    trajs = initial_trajectory_from_state(init_states, desired)
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-6, 1e-6, iters),
    )

    from quadrotorilqr_tpu.kernels.solve import solve_fused_whole

    @jax.jit
    def run(p, c, t):
        _, cost_v, iters, _, probes = solve_fused_whole(
            p, c, t, dt, options, return_probes=True
        )
        # the whole-solve kernel runs each TILE for its own max iteration
        # count — the work model's trip count is the mean of per-tile
        # maxima, and the probe counter reports the EXECUTED line-search
        # sweeps (round 2 assumed 1.0 per trip)
        tile_iters = jnp.max(iters.reshape(-1, 128), axis=1)
        tile_probes = jnp.max(probes.reshape(-1, 128), axis=1)
        return jnp.stack(
            [
                jnp.sum(cost_v),
                jnp.mean(tile_iters.astype(jnp.float32)),
                jnp.mean(tile_probes),
            ]
        )

    compiled = run.lower(params, cost, trajs).compile()
    out = np.asarray(compiled(params, cost, trajs))
    p50 = _time_compiled(compiled, (params, cost, trajs))
    floor = measure_dispatch_floor_s()
    device_s = max(p50 - floor, 1e-6)
    trips = float(out[1])  # mean per-tile outer trips (whole-solve kernel)
    rollouts_per_trip = float(out[2]) / max(trips, 1e-6)

    vpu = measure_vpu_peak_gflops()
    bw = measure_hbm_bw_gbs()
    rep = roofline_report(
        n, batch, trips, device_s,
        rollouts_per_trip=rollouts_per_trip,
        vpu_peak_gflops=vpu, hbm_bw_gbs=bw,
    )
    rep["rollouts_per_trip_measured"] = round(rollouts_per_trip, 2)
    # the streaming (depth=1) FMA rate: the binding ceiling for code at
    # ~1 flop per element touch; the solver kernels sit between the two
    rep["vmem_stream_fma_gflops_measured"] = round(
        measure_vmem_fma_gflops(), 1
    )
    rep.update(
        workload=f"hover batch={batch} N={n} trips={trips:.0f}",
        p50_wall_s=round(p50, 4),
        dispatch_floor_s=round(floor, 4),
        device_s=round(device_s, 4),
        solves_per_s=round(batch / p50, 1),
        device=str(jax.devices()[0].device_kind),
    )

    # FDDP whole-solve kernel on the same workload (robust mode's
    # speed-of-light accounting, fddp_solve_flops work model with the
    # kernel-reported probe count; gap_tol 1e-5 is the f32 feasibility
    # floor, FDDPOptions docstring)
    from quadrotorilqr_tpu.kernels.fddp import solve_fddp_fused
    from quadrotorilqr_tpu.solver.batched import solve_batch_fddp_refine
    from quadrotorilqr_tpu.solver.fddp import FDDPOptions

    fo = FDDPOptions(gap_tol=1e-5)

    @jax.jit
    def run_fddp(p, c, t):
        _, cost_v, iters, status, probes = solve_fddp_fused(
            p, c, t, dt, options, fddp_options=fo, return_probes=True
        )
        tile_iters = jnp.max(iters.reshape(-1, 128), axis=1)
        tile_probes = jnp.max(probes.reshape(-1, 128), axis=1)
        return jnp.stack(
            [
                jnp.sum(cost_v),
                jnp.mean(tile_iters.astype(jnp.float32)),
                jnp.mean(tile_probes),
            ]
        )

    compiled_f = run_fddp.lower(params, cost, trajs).compile()
    out_f = np.asarray(compiled_f(params, cost, trajs))
    p50_f = _time_compiled(compiled_f, (params, cost, trajs))
    device_f = max(p50_f - floor, 1e-6)
    trips_f = float(out_f[1])
    probes_f = float(out_f[2])
    rollouts_per_trip = probes_f / max(trips_f, 1e-6)
    flops_f = fddp_solve_flops(n, batch, trips_f, rollouts_per_trip)
    ach_f = flops_f / device_f / 1e9
    rep["fddp"] = {
        "analytic_flops_per_solve": flops_f / batch,
        "trips": round(trips_f, 1),
        "probe_sweeps": round(probes_f, 1),
        "rollouts_per_trip_measured": round(rollouts_per_trip, 2),
        "achieved_gflops": round(ach_f, 1),
        "pct_vpu_peak": round(100 * ach_f / vpu, 1),
        "solves_per_s": round(batch / p50_f, 1),
        "device_s": round(device_f, 4),
    }

    # the SUPERTILE FDDP kernel's speed-of-light fraction (round 5): the
    # same work model with the same kernel-reported counts (trip/probe
    # counts from the lane-layout run — per-lane semantics are identical)
    if batch % 1024 == 0:
        @jax.jit
        def run_fddp_super(p, c, t):
            _, cost_v, _, _, _ = solve_fddp_fused(
                p, c, t, dt, options, fddp_options=fo,
                return_probes=True, supertile=True,
            )
            return jnp.sum(cost_v)[None]

        compiled_fs = run_fddp_super.lower(params, cost, trajs).compile()
        np.asarray(compiled_fs(params, cost, trajs))
        p50_fs = _time_compiled(compiled_fs, (params, cost, trajs))
        device_fs = max(p50_fs - floor, 1e-6)
        ach_fs = flops_f / device_fs / 1e9
        rep["fddp_supertile"] = {
            "achieved_gflops": round(ach_fs, 1),
            "pct_vpu_peak": round(100 * ach_fs / vpu, 1),
            "solves_per_s": round(batch / p50_fs, 1),
            "device_s": round(device_fs, 4),
        }

    # compacted multi-phase refine: the production robust configuration —
    # stragglers stop forcing whole-tile trips/probes, so the same lane
    # work finishes in less wall time (throughput row; the work executed
    # per phase varies, so no separate GFLOP/s claim)
    @jax.jit
    def run_refine(p, c, t):
        res = solve_batch_fddp_refine(
            p, c, t, dt, options, fddp_options=fo,
            phase1_iters=(3, 5, 7),
        )
        return jnp.stack(
            [jnp.sum(res.cost), jnp.mean(res.iterations.astype(jnp.float32))]
        )

    compiled_r = run_refine.lower(params, cost, trajs).compile()
    np.asarray(compiled_r(params, cost, trajs))
    p50_r = _time_compiled(compiled_r, (params, cost, trajs))
    rep["fddp_refine"] = {
        "solves_per_s": round(batch / p50_r, 1),
        "device_s": round(max(p50_r - floor, 1e-6), 4),
        "phase_bounds": [3, 5, 7],
    }
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
