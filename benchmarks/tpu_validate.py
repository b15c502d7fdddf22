"""Real-TPU validation sweep: finiteness + cross-engine parity by shape.

The interpret-mode parity tests (tests/) pin every kernel lane-for-lane on
CPU, but Mosaic-compiled behavior and f32-at-depth behavior only show up on
hardware — this sweep caught both a tail-chunk DMA regression and the f32
long-horizon NaN (see BENCH_LOCAL.md "f32 long-horizon stability"). Run it
after any kernel change, BEFORE trusting new benchmark numbers:

    python benchmarks/tpu_validate.py

Exits nonzero on any nonfinite cost or streamed-vs-batch-loop mismatch.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from quadrotorilqr_tpu.app.workloads import long_horizon_problem  # noqa: E402
from quadrotorilqr_tpu.kernels.stream import solve_fused_streamed  # noqa: E402
from quadrotorilqr_tpu.solver.batched import solve_batch_fused  # noqa: E402
from quadrotorilqr_tpu.solver.options import (  # noqa: E402
    ConvergenceCriteria,
    ILQROptions,
    LineSearchParams,
)

DTYPE = jnp.float32

# (batch, horizon, chunk): exercises the VMEM kernel range, tail chunks of
# width 1, odd batches of >1 tile, and horizons past every VMEM bound.
SHAPES = [
    (128, 40, 64),
    (256, 97, 32),
    (128, 260, 64),
    (256, 300, 128),
    (128, 513, 64),
    (128, 1024, 128),
]


def _problem(batch, n):
    return long_horizon_problem(batch, n, DTYPE)


def main():
    options = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-6, 1e-6, 6),
    )
    failures = 0
    for batch, n, chunk in SHAPES:
        params, cost, trajs = _problem(batch, n)
        traj_s, cost_s, it_s, st_s = solve_fused_streamed(
            params, cost, trajs, 0.02, options, chunk=chunk
        )
        c = np.asarray(cost_s)
        st = np.asarray(st_s)
        line = (
            f"n={n:5d} b={batch} chunk={chunk:3d}: "
            f"finite={np.isfinite(c).mean():.3f} conv={(st == 1).mean():.3f}"
        )
        ok = np.isfinite(c).all()
        try:
            ref = solve_batch_fused(params, cost, trajs, 0.02, options)
            cr = np.asarray(ref.cost)
            rel = np.abs(c - cr) / np.maximum(1e-6, np.abs(cr))
            du = np.abs(
                np.asarray(traj_s.controls)
                - np.asarray(ref.trajectory.controls)
            ).max()
            line += f" | vs batch-loop: relcost={rel.max():.2e} |du|={du:.2e}"
            # f32 engines share the stage math but not the op schedule;
            # borderline lanes may flip a convergence trip — bound the bulk.
            ok = ok and np.isfinite(cr).all() and np.median(rel) < 1e-4
        except Exception as e:  # VMEM compile failure at very long N
            line += f" | batch-loop: {type(e).__name__} (expected at long N)"
        print(("OK   " if ok else "FAIL ") + line, flush=True)
        failures += 0 if ok else 1

    # weighted-cost pass on the compiled kernels (interpret-mode parity is
    # pinned in tests/test_stage_weights.py; Mosaic behavior of the weight
    # operand's BlockSpec/DMA only shows up here). Whole-solve routing +
    # streamed weight row + batch loop, one moderate shape each.
    from dataclasses import replace

    from quadrotorilqr_tpu.solver.batched import solve_batch_latency

    params, cost, trajs = _problem(256, 97)
    w = jnp.asarray(
        0.5 + np.random.default_rng(3).random(97), DTYPE
    ).at[-1].set(20.0)
    cost_w = replace(cost, stage_weights=w)
    res_w = solve_batch_latency(params, cost_w, trajs, 0.02, options)
    ref_w = solve_batch_fused(params, cost_w, trajs, 0.02, options)
    cw, cr = np.asarray(res_w.cost), np.asarray(ref_w.cost)
    rel = np.abs(cw - cr) / np.maximum(1e-6, np.abs(cr))
    ok = np.isfinite(cw).all() and np.isfinite(cr).all() and np.median(rel) < 1e-4
    sw_traj, sw_cost, _, _ = solve_fused_streamed(
        params, cost_w, trajs, 0.02, options, chunk=32
    )
    cs = np.asarray(sw_cost)
    rel_s = np.abs(cs - cr) / np.maximum(1e-6, np.abs(cr))
    ok = ok and np.isfinite(cs).all() and np.median(rel_s) < 1e-4
    print(
        ("OK   " if ok else "FAIL ")
        + f"weighted n=97 b=256: whole-vs-loop relcost={np.median(rel):.2e} "
        f"streamed-vs-loop relcost={np.median(rel_s):.2e}",
        flush=True,
    )
    failures += 0 if ok else 1

    # FDDP whole-solve kernel (kernels/fddp.py) compiled-Mosaic check:
    # interpret parity is pinned in tests/test_fddp_fused.py; the per-lane
    # mu row, defect scratch DMA, and the |x|<inf Goldstein guard only get
    # Mosaic-lowered here. Reference = the vmapped XLA FDDP at the same f32
    # precision (schedules differ; bound the bulk like the blocks above).
    import jax

    from quadrotorilqr_tpu.solver.batched import solve_batch_fddp
    from quadrotorilqr_tpu.solver.fddp import FDDPOptions, solve_fddp

    params, cost, trajs = _problem(128, 50)
    fddp_opts = ILQROptions(
        line_search_params=LineSearchParams(0.5, 0.5, 20),
        convergence_criteria=ConvergenceCriteria(1e-6, 1e-6, 12),
    )
    # f32 gaps floor at ~1e-5; the f64 default gap_tol is unreachable here
    # (FDDPOptions docstring)
    fo = FDDPOptions(gap_tol=1e-5)
    res_f = solve_batch_fddp(
        params, cost, trajs, 0.02, fddp_opts, fddp_options=fo
    )
    ref_f = jax.jit(
        jax.vmap(lambda t: solve_fddp(params, cost, t, 0.02, fddp_opts, fo))
    )(trajs)
    cf, cr = np.asarray(res_f.cost), np.asarray(ref_f.cost)
    stf = np.asarray(res_f.status)
    rel = np.abs(cf - cr) / np.maximum(1e-6, np.abs(cr))
    # Pairwise lane drift between the two f32 FDDP engines on REAL TPU is
    # dominated by Goldstein accept-boundary flips (Mosaic vs XLA
    # transcendental/FMA differences): measured 2026-08-19 median 2.4e-4,
    # while BOTH engines sit at the SAME quality vs an f64 ground truth
    # (excess-over-optimum medians -9.00e-2 vs -8.99e-2; kernel closer on
    # 47.7% of lanes — a coin flip; kernel conv 96.1% vs XLA 94.5%). So
    # bound engine QUALITY (cost-distribution median), and only bound the
    # pairwise bulk loosely.
    med_shift = abs(np.median(cf) - np.median(cr)) / abs(np.median(cr))
    ok = (
        np.isfinite(cf).all()
        and (stf == 1).mean() > 0.9
        and np.median(rel) < 1e-3
        and med_shift < 1e-3
    )
    print(
        ("OK   " if ok else "FAIL ")
        + f"fddp n=50 b=128: conv={(stf == 1).mean():.3f} "
        f"vs XLA relcost={np.median(rel):.2e} med-shift={med_shift:.2e}",
        flush=True,
    )
    failures += 0 if ok else 1

    # control limits on the whole-solve engines (box-QP stage under Mosaic
    # was previously batch-loop only): whole-solve + streamed vs batch loop.
    from quadrotorilqr_tpu.solver.batched import solve_batch_latency as _lat

    params, cost, trajs = _problem(128, 60)
    lim = (0.0, 7.0)
    res_b = _lat(params, cost, trajs, 0.02, options, limits=lim)
    ref_b = solve_batch_fused(params, cost, trajs, 0.02, options, limits=lim)
    cb, crb = np.asarray(res_b.cost), np.asarray(ref_b.cost)
    relb = np.abs(cb - crb) / np.maximum(1e-6, np.abs(crb))
    st_b, _, _, ss_b = solve_fused_streamed(
        params, cost, trajs, 0.02, options, chunk=32, limits=lim
    )
    ub = np.asarray(st_b.controls)
    ok = (
        np.isfinite(cb).all()
        and np.median(relb) < 1e-4
        and ub.max() <= 7.0 + 1e-5
        and ub.min() >= -1e-5
    )
    print(
        ("OK   " if ok else "FAIL ")
        + f"box n=60 b=128: whole-vs-loop relcost={np.median(relb):.2e} "
        f"streamed u in [{ub.min():.2f}, {ub.max():.2f}]",
        flush=True,
    )
    failures += 0 if ok else 1

    # streamed FDDP (kernels/stream_fddp.py): long horizon past the VMEM
    # FDDP bound, odd chunk -> boundary-defect DMA machinery under Mosaic.
    from quadrotorilqr_tpu.kernels.stream_fddp import solve_fddp_streamed

    params, cost, trajs = _problem(128, 300)
    s_traj, s_cost, _, s_stat = solve_fddp_streamed(
        params, cost, trajs, 0.02, fddp_opts, fddp_options=fo, chunk=64
    )
    cs = np.asarray(s_cost)
    sts = np.asarray(s_stat)
    ref_s = jax.jit(
        jax.vmap(lambda t: solve_fddp(params, cost, t, 0.02, fddp_opts, fo))
    )(trajs)
    crs = np.asarray(ref_s.cost)
    rel = np.abs(cs - crs) / np.maximum(1e-6, np.abs(crs))
    # same quality-based criterion as the VMEM FDDP block above (accept-flip
    # noise between equally-good f32 engines; see that block's comment)
    med_shift = abs(np.median(cs) - np.median(crs)) / abs(np.median(crs))
    ok = (
        np.isfinite(cs).all()
        and (sts == 1).mean() > 0.9
        and np.median(rel) < 1e-3
        and med_shift < 1e-3
    )
    print(
        ("OK   " if ok else "FAIL ")
        + f"fddp-streamed n=300 b=128 chunk=64: conv={(sts == 1).mean():.3f} "
        f"vs XLA relcost={np.median(rel):.2e} med-shift={med_shift:.2e}",
        flush=True,
    )
    failures += 0 if ok else 1

    if failures:
        sys.exit(f"{failures} shape(s) failed")
    print("SWEEP OK")


if __name__ == "__main__":
    main()
