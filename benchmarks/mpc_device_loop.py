"""On-device MPC certification loop (VERDICT r3 #7; BASELINE.json config 4).

The 100 Hz target cannot be certified by host-driven dispatch through the
axon tunnel — the ~27 ms per-dispatch floor IS the measurement. This bench
certifies the DEVICE time per control tick instead: the whole closed loop
(plant = the same rigid-body dynamics under a deliberately MISMATCHED
parameter set, controller = the warm-started whole-solve kernel) runs as
one compiled `lax.scan` of K ticks per launch (app/mpc.run_mpc), and the
host reads back ONE 4-float probe per launch.

Per-tick device latency is extracted by the chunk-size slope: launching
chunks of C ticks for C in CHUNKS and fitting median-launch-time vs C —
the slope is the device per-tick cost, the intercept is the fixed
dispatch+transfer overhead the tunnel imposes on ANY launch. The tail
(p99) is computed from the launch distribution at the largest C after
subtracting that intercept; its granularity (one launch = C ticks) is
reported alongside, not hidden.

Fleet sizes 1 and 32 pad to the kernel's 128-lane tile: a fleet of <=128
quadrotors costs exactly one tile of device time — measured here rather
than asserted (the three rows should agree within noise; that agreement
IS the tile-quantization finding).

Run on the real TPU:  python benchmarks/mpc_device_loop.py
CPU smoke:            QILQR_MPC_INTERPRET=1 QILQR_MPC_TICKS=8 ...
Env: QILQR_MPC_HORIZON (50) / QILQR_MPC_TICKS (128 per largest chunk) /
QILQR_MPC_FLEETS ("1,32,128") / QILQR_MPC_MISMATCH (0.05).
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

from quadrotorilqr_tpu.app import workloads  # noqa: E402
from quadrotorilqr_tpu.app.mpc import mpc_warm_start, run_mpc  # noqa: E402
from quadrotorilqr_tpu.lie import se3  # noqa: E402
from quadrotorilqr_tpu.models.quadrotor import (  # noqa: E402
    QuadrotorParams,
    State,
)
from quadrotorilqr_tpu.solver.ilqr import Trajectory  # noqa: E402
from quadrotorilqr_tpu.solver.options import (  # noqa: E402
    ConvergenceCriteria,
    ILQROptions,
    LineSearchParams,
)

DTYPE = jnp.float32
DT = 0.01  # 100 Hz control rate — the config-4 target
HORIZON = int(os.environ.get("QILQR_MPC_HORIZON", 50))
TICKS = int(os.environ.get("QILQR_MPC_TICKS", 128))
FLEETS = tuple(
    int(x) for x in os.environ.get("QILQR_MPC_FLEETS", "1,32,128").split(",")
)
MISMATCH = float(os.environ.get("QILQR_MPC_MISMATCH", 0.05))
INTERPRET = os.environ.get("QILQR_MPC_INTERPRET", "") == "1"
CHUNKS = tuple(
    c for c in (max(TICKS // 16, 1), max(TICKS // 4, 2), TICKS) if c <= TICKS
)


def build(fleet):
    """Hover regulation from perturbed poses; the plant runs MISMATCHED
    params (mass/inertia +MISMATCH) — the condition a deployed loop
    actually certifies under."""
    lanes = max(fleet, 128)  # the kernel tile: a fleet of <=128 costs one
    params = QuadrotorParams.create(
        1.0, jnp.eye(3, dtype=DTYPE), 0.2, 0.016, 9.81
    )
    plant = QuadrotorParams.create(
        1.0 * (1.0 + MISMATCH),
        (1.0 + MISMATCH) * jnp.eye(3, dtype=DTYPE),
        0.2,
        0.016,
        9.81,
    )
    n_full = TICKS + HORIZON + 8
    hover_u = jnp.full((n_full, 4), (1.0 + MISMATCH) * 9.81 / 4.0, DTYPE)
    desired = Trajectory(
        times=jnp.arange(n_full, dtype=DTYPE) * DT,
        states=State(
            pose=se3.identity((n_full,), DTYPE),
            vel=jnp.zeros((n_full, 6), DTYPE),
        ),
        controls=hover_u,
    )
    q, r = workloads.demo_weights(DTYPE)
    key = jax.random.PRNGKey(7)
    tau = 0.25 * jax.random.normal(key, (lanes, 6), DTYPE)
    tau = tau.at[:, 3:6].set(0.0)
    # lanes beyond the fleet copy lane 0 (padding; same device cost)
    tau = jnp.where(jnp.arange(lanes)[:, None] < fleet, tau, tau[0:1])
    x0 = State(pose=se3.exp(tau), vel=jnp.zeros((lanes, 6), DTYPE))
    opts = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 8),
        convergence_criteria=ConvergenceCriteria(1e-5, 1e-5, 3),
    )
    return params, plant, q, r, desired, x0, opts


def make_chunk(c_ticks, params, plant, q, r, desired, opts):
    @jax.jit
    def chunk(x, warm):
        outs = run_mpc(
            params, q, r, desired, x,
            n_steps=c_ticks, horizon=HORIZON, dt_s=DT, options=opts,
            interpret=INTERPRET, latency_kernel=True,
            plant_params=plant, warm0=warm,
        )
        probe = jnp.stack(
            [
                jnp.sum(jnp.abs(outs["u"][:, -1])),
                jnp.mean(outs["iterations"].astype(jnp.float32)),
                jnp.mean(
                    jnp.linalg.norm(outs["x_final"].pose.trans, axis=-1)
                ),
                jnp.mean(outs["cost"][:, -1]),
            ]
        )
        return outs["x_final"], outs["warm_final"], probe

    return chunk


def bench_fleet(fleet):
    params, plant, q, r, desired, x0, opts = build(fleet)
    warm = mpc_warm_start(desired, x0, HORIZON)
    rows = {}
    final_err = None
    for c in CHUNKS:
        chunk = make_chunk(c, params, plant, q, r, desired, opts)
        t0 = time.perf_counter()
        x, w, probe = chunk(x0, warm)
        _ = np.asarray(probe)  # sync (block_until_ready lies on the tunnel)
        compile_s = time.perf_counter() - t0
        n_launch = max(3, min(24, 192 // c))
        times = []
        x, w = x0, warm
        for _ in range(n_launch):
            t0 = time.perf_counter()
            x, w, probe = chunk(x, w)
            pr = np.asarray(probe)
            times.append(time.perf_counter() - t0)
        final_err = float(pr[2])
        rows[c] = {
            "launches": n_launch,
            "p50_s": float(np.median(times)),
            "p99_s": float(np.percentile(times, 99)),
            "compile_s": round(compile_s, 1),
        }
    cs = np.asarray(sorted(rows), dtype=np.float64)
    p50s = np.asarray([rows[int(c)]["p50_s"] for c in cs])
    slope, intercept = np.polyfit(cs, p50s, 1)  # per-tick device time
    c_max = int(cs[-1])
    tail = (rows[c_max]["p99_s"] - intercept) / c_max
    return {
        "fleet": fleet,
        "lanes": max(fleet, 128),
        "per_tick_p50_ms": round(slope * 1e3, 3),
        "per_tick_p99_ms": round(tail * 1e3, 3),
        "p99_granularity_ticks": c_max,
        "dispatch_intercept_ms": round(intercept * 1e3, 1),
        "implied_rate_hz": round(1.0 / slope, 1) if slope > 0 else None,
        "certifies_100hz_p50": bool(slope < 0.01),
        "certifies_100hz_p99": bool(tail < 0.01),
        "final_mean_pos_err_m": round(final_err, 4),
        "chunks": rows,
    }


def main():
    out = {
        "metric": (
            f"MPC device per-tick latency (horizon {HORIZON}, warm-started "
            f"whole-solve kernel, plant mass/inertia +{MISMATCH:.0%} "
            f"mismatch, {TICKS} ticks/launch max)"
        ),
        "unit": "ms/tick (device, chunk-slope)",
        "rows": [bench_fleet(f) for f in FLEETS],
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
