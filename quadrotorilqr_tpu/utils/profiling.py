"""Profiling helpers: jax.profiler traces + trustworthy wall-clock timing.

Timing rule for this environment (see .claude/skills/verify/SKILL.md): under
the axon TPU tunnel, `jax.block_until_ready` can return before device work
finishes — the only reliable sync is a host read of an output. `time_compiled`
bakes that in: it AOT-compiles a scalar-reduced wrapper and times executions
synced by tiny transfers.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard / xprof.

    >>> with trace("/tmp/qilqr-trace"):
    ...     result = solve_batch_fused(...)
    ...     float(np.asarray(result.cost.sum()))  # sync inside the trace
    """
    with jax.profiler.trace(log_dir):
        yield


def time_compiled(fn, args=(), repeats=5, reduce=True):
    """(p50_seconds, compile_seconds, last_output) for a jittable `fn`.

    With `reduce` (default), `fn`'s outputs collapse to ONE stacked f32
    vector of per-leaf sums inside the compiled program: a single tiny host
    read syncs the device. Reading K separate outputs would both transfer
    more and pay (K-1) extra ~27 ms tunnel round trips per sample —
    returning a tuple of scalars is the exact timing bug this helper exists
    to prevent.
    """

    @jax.jit
    def wrapped(*a):
        out = fn(*a)
        if reduce:
            return jnp.stack(
                [jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(out)]
            )
        return out

    t0 = time.perf_counter()
    compiled = wrapped.lower(*args).compile()
    compile_s = time.perf_counter() - t0

    def run():
        t0 = time.perf_counter()
        out = compiled(*args)
        out = jax.tree.map(lambda x: np.asarray(x), out)  # sync
        return time.perf_counter() - t0, out

    _, out = run()  # warm-up
    times = []
    for _ in range(repeats):
        dt, out = run()
        times.append(dt)
    return float(np.median(times)), compile_s, out


def chunk_slope(body, args, chunks=(1, 4, 16), repeats=5, carry_width=3):
    """DEVICE seconds per `body` execution by chunk-size slope — the
    tunnel-independent estimator (VERDICT r4 #4).

    The intercept-subtraction method (wall p50 minus a same-session nop
    floor) leaves a 12-17 ms residual whose run-to-run noise swung derived
    device rates 1.4x between same-day runs on identical code. This
    estimator instead compiles, for each S in `chunks`, ONE launch that
    executes `body` S times sequentially — `body(carry, *args)` returns a
    (carry_width,) f32 vector and MUST consume `carry` (e.g. add
    eps*carry[0], eps==0, into an operand) so XLA cannot collapse the
    chain — and fits median launch wall time vs S:

        wall(S) = intercept + S * device_s

    The slope cancels the tunnel's fixed dispatch+transfer overhead
    EXACTLY (it is the same additive constant for every S), which is how
    benchmarks/mpc_device_loop.py certifies 100 Hz control ticks.

    The default chunks span 15 device-times: with the tunnel's ±2-4 ms
    per-launch noise, a (1, 2, 4) span of 3x device_s produced garbage
    slopes whenever device_s was under ~15 ms (measured: a cfg2 record
    claiming 180% of the FMA peak). Widen further for sub-millisecond
    bodies.

    Returns (device_s, intercept_s, {chunk: p50_wall_s}).
    """

    results = {}
    for s_chunk in chunks:

        @jax.jit
        def runc(*a, _s=s_chunk):
            return jax.lax.fori_loop(
                0,
                _s,
                lambda i, carry: body(carry, *a),
                jnp.zeros((carry_width,), jnp.float32),
            )

        compiled = runc.lower(*args).compile()
        np.asarray(compiled(*args))  # warm-up + sync
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(compiled(*args))
            ts.append(time.perf_counter() - t0)
        results[s_chunk] = float(np.median(ts))
    cs = np.asarray(sorted(results), dtype=np.float64)
    p50s = np.asarray([results[int(s)] for s in cs])
    slope, intercept = np.polyfit(cs, p50s, 1)
    device_s = float(slope) if slope > 0 else None
    return device_s, float(max(intercept, 0.0)), results
