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
