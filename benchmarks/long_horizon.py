"""Long-horizon regime: streamed whole-solve kernel vs the batch loop.

The reference's horizon loop is strictly sequential (ilqr.hh:109-141,
157-169) and its demo uses N=40; nothing in it bounds N except time. On
TPU the VMEM-resident kernels cap at MAX_HORIZON (kernels/solve.py) and
the batch-loop kernels fail to compile past N~1024 (per-tile VMEM), so
the streamed kernel (kernels/stream.py) is the only kernel engine in this
regime. This bench pins the crossover table recorded in BENCH_LOCAL.md.

Run: python benchmarks/long_horizon.py [--batch 128] [--horizons 512,1024,2048,4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from quadrotorilqr_tpu.app.workloads import long_horizon_problem  # noqa: E402
from quadrotorilqr_tpu.kernels.stream import solve_fused_streamed  # noqa: E402
from quadrotorilqr_tpu.solver.batched import solve_batch_fused  # noqa: E402
from quadrotorilqr_tpu.solver.options import (  # noqa: E402
    ConvergenceCriteria,
    ILQROptions,
)
from quadrotorilqr_tpu.utils.profiling import time_compiled  # noqa: E402

DTYPE = jnp.float32


def _problem(batch, n):
    params, cost, trajs = long_horizon_problem(batch, n, DTYPE)
    options = ILQROptions(
        convergence_criteria=ConvergenceCriteria(1e-6, 1e-6, 10)
    )
    return params, cost, trajs, options


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--horizons", default="512,1024,2048,4096")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    rows = []
    for n in (int(x) for x in args.horizons.split(",")):
        params, cost, trajs, options = _problem(args.batch, n)
        row = {"n": n, "batch": args.batch}

        p50, comp, _ = time_compiled(
            lambda t: solve_fused_streamed(params, cost, t, 0.02, options),
            (trajs,), repeats=args.repeats,
        )
        row["streamed_p50_ms"] = round(p50 * 1e3, 1)
        row["streamed_solves_per_s"] = round(args.batch / p50, 1)

        if args.batch % 1024 == 0:
            # round-5: the supertile layout streams too (the packed HBM
            # streams gain a sublane dim; measured 1.86x at N=512/B=4096)
            p50s, _, _ = time_compiled(
                lambda t: solve_fused_streamed(
                    params, cost, t, 0.02, options, supertile=True
                ),
                (trajs,), repeats=args.repeats,
            )
            row["streamed_super_p50_ms"] = round(p50s * 1e3, 1)
            row["streamed_super_solves_per_s"] = round(args.batch / p50s, 1)
            row["super_speedup"] = round(p50 / p50s, 2)

        try:
            p50b, _, _ = time_compiled(
                lambda t: solve_batch_fused(params, cost, t, 0.02, options),
                (trajs,), repeats=args.repeats,
            )
            row["batch_loop_p50_ms"] = round(p50b * 1e3, 1)
        except Exception as e:  # VMEM compile failure past N~1024
            row["batch_loop_p50_ms"] = None
            row["batch_loop_error"] = f"{type(e).__name__}"
        print(json.dumps(row), flush=True)
        rows.append(row)

    print("\n| N | streamed p50 | batch loop p50 |")
    print("|---|---|---|")
    for r in rows:
        bl = (
            f"{r['batch_loop_p50_ms']} ms"
            if r["batch_loop_p50_ms"] is not None
            else "compile FAIL (VMEM)"
        )
        print(f"| {r['n']} | {r['streamed_p50_ms']} ms | {bl} |")


if __name__ == "__main__":
    main()
