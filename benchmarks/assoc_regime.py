"""Sequential vs associative (O(log N)) Riccati backward pass: the (B, N)
crossover grid that settles parallel-in-time dispatch (VERDICT r3 #8).

For every (batch, horizon) cell both modes run the SAME full solves
(solve_batch(associative=...)); the table prints p50 latency for each and
the winner. The associative mode's combine is 13x13 block algebra over
lax.associative_scan — O(log N) depth but ~3x the flops and worse locality,
so it wins only where depth dominates: SMALL batch x LONG horizon. The
measured table feeds solver/ilqr.resolve_associative ("auto" dispatch);
re-run this after kernel/compiler changes and update the rule if the
frontier moved.

Run on the real TPU: python benchmarks/assoc_regime.py
Env: QILQR_ASSOC_BS ("1,8,64,512") / QILQR_ASSOC_NS ("128,512,2048") /
QILQR_ASSOC_REPEATS (5).
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import json  # noqa: E402
import sys  # noqa: E402
import time  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from quadrotorilqr_tpu.app import workloads  # noqa: E402
from quadrotorilqr_tpu.costs.quadratic import QuadraticTrackingCost  # noqa: E402
from quadrotorilqr_tpu.models.quadrotor import QuadrotorParams  # noqa: E402
from quadrotorilqr_tpu.parallel.batch import (  # noqa: E402
    initial_trajectory_from_state,
    solve_batch,
)
from quadrotorilqr_tpu.solver.options import (  # noqa: E402
    ConvergenceCriteria,
    ILQROptions,
    LineSearchParams,
)

DT = 0.02
DTYPE = jnp.float32
BS = tuple(
    int(x) for x in os.environ.get("QILQR_ASSOC_BS", "1,8,64,512").split(",")
)
NS = tuple(
    int(x) for x in os.environ.get("QILQR_ASSOC_NS", "128,512,2048").split(",")
)
REPEATS = int(os.environ.get("QILQR_ASSOC_REPEATS", 5))

params = QuadrotorParams.create(1.0, jnp.eye(3, dtype=DTYPE), 0.2, 0.016, 9.81)
q, r = workloads.demo_weights(DTYPE)
options = ILQROptions(
    line_search_params=LineSearchParams(0.5, 0.5, 20),
    convergence_criteria=ConvergenceCriteria(1e-6, 1e-6, 5),
)


def cell(b, n):
    i0, des = workloads.hover_to_waypoint(
        jax.random.PRNGKey(1), b, n=n, dt_s=DT, dtype=DTYPE, pose_scale=0.2
    )
    cost = QuadraticTrackingCost(
        Q=q, R=r, desired_states=des.states, desired_controls=des.controls
    )
    trajs = initial_trajectory_from_state(i0, des)
    out = {}
    for assoc in (False, True):
        @jax.jit
        def run(p, c, t, assoc=assoc):
            res = solve_batch(p, c, t, DT, options, associative=assoc)
            return jnp.stack(
                [
                    jnp.sum(res.cost),
                    jnp.mean(res.iterations.astype(jnp.float32)),
                ]
            )

        t0 = time.perf_counter()
        compiled = run.lower(params, cost, trajs).compile()
        comp = time.perf_counter() - t0
        o = np.asarray(compiled(params, cost, trajs))  # warm + sync
        ts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            o = np.asarray(compiled(params, cost, trajs))
            ts.append(time.perf_counter() - t0)
        finite = bool(np.isfinite(o[0]))
        out[assoc] = {
            "p50_ms": round(float(np.median(ts)) * 1e3, 1),
            "finite": finite,
            "compile_s": round(comp, 1),
        }
    return out


def main():
    rows = []
    print(f"| B | N | sequential | associative | winner |")
    print(f"|---|---|-----------|-------------|--------|")
    for b in BS:
        for n in NS:
            o = cell(b, n)
            seq, asc = o[False], o[True]
            if not seq["finite"]:
                winner = "associative (sequential NaN)"
            elif not asc["finite"]:
                winner = "sequential (associative NaN)"
            else:
                winner = (
                    "associative"
                    if asc["p50_ms"] < seq["p50_ms"]
                    else "sequential"
                )
            print(
                f"| {b} | {n} | {seq['p50_ms']} ms | {asc['p50_ms']} ms "
                f"| {winner} |",
                flush=True,
            )
            rows.append(
                {"B": b, "N": n, "seq": seq, "assoc": asc, "winner": winner}
            )
    print(
        json.dumps(
            {
                "metric": "sequential vs associative Riccati (B,N) grid",
                "rows": rows,
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
