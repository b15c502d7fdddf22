"""Lane-layout hypothesis probe (VERDICT r3 #6 groundwork).

The fused kernels lay scenario batches in the MINOR/lane dim: a lane
matrix is (r, c, 128), so Mosaic tiles its minor-2 dims (c, 128) into
ceil(c/8) sublane registers per row — 50% sublane waste at c=4 (the
quadrotor's control dim), 25% at c=12, and every L.transpose moves data
across sublanes. The candidate fix is a SUPERTILE layout (r, c, 8, 128):
1024 scenarios per tile, 8 riding the sublane dim — perfectly dense for
every (r, c), with transposes becoming free leading-dim swaps.

This probe measures the per-scenario cost of the Riccati stage's dominant
op mix (12x12 matmul chains, 12x4 gain algebra, 4x4 Cholesky solves,
transposes) in both layouts, same total scenario count, real Mosaic
lowering — BEFORE committing to the kernel-wide relayout. If the 4D
layout does not win decisively here, item r3#6 dies cheaply.

Run on the real TPU: python benchmarks/layout_probe.py
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

DTYPE = jnp.float32
ITERS = int(os.environ.get("QILQR_PROBE_ITERS", 200))  # stage-mix reps
U = 4


def _matmul(a, b):
    """(r, k, ...B) @ (k, c, ...B) -> (r, c, ...B): unrolled outer
    products, layout-agnostic (...B = (128,) lane or (8, 128) supertile)."""
    out = None
    for i in range(a.shape[1]):
        term = jnp.expand_dims(a[:, i], 1) * jnp.expand_dims(b[i], 0)
        out = term if out is None else out + term
    return out


def _matvec(m, v):
    out = None
    for i in range(m.shape[1]):
        term = m[:, i] * v[i : i + 1]
        out = term if out is None else out + term
    return out


def _chol_solve(a, b, n):
    """Cholesky + triangular solves on (n, n, ...B) lane matrices (the
    kernels' ops/linalg mirror, layout-agnostic port for the probe)."""
    l_cols = []
    for j in range(n):
        s = a[j, j]
        for k in range(j):
            s = s - l_cols[k][j] * l_cols[k][j]
        d = jax.lax.rsqrt(s)
        col = []
        for i in range(n):
            if i < j:
                col.append(jnp.zeros_like(a[0, 0]))
            else:
                t = a[i, j]
                for k in range(j):
                    t = t - l_cols[k][i] * l_cols[k][j]
                col.append(t * d)
        l_cols.append(col)
    # forward/back substitution on b (n, c, ...B)
    y = []
    for i in range(n):
        t = b[i]
        for k in range(i):
            t = t - jnp.expand_dims(l_cols[k][i], 0) * y[k]
        y.append(t / jnp.expand_dims(l_cols[i][i], 0))
    x = [None] * n
    for i in reversed(range(n)):
        t = y[i]
        for k in range(i + 1, n):
            t = t - jnp.expand_dims(l_cols[i][k], 0) * x[k]
        x[i] = t / jnp.expand_dims(l_cols[i][i], 0)
    return jnp.stack(x, axis=0)


def stage_mix(vxx, jx, ju, quu0):
    """The Riccati stage's op-mix skeleton: J_x^T V J_x (12x12 chains),
    V J_u (12xU), Quu Cholesky solve with a (U, 13) rhs, gain outer
    products, symmetrization — same flop structure both layouts."""
    t = _matmul(vxx, jx)  # (12,12)
    qxx = _matmul(jnp.swapaxes(jx, 0, 1), t)
    vju = _matmul(vxx, ju)  # (12,U)
    quu = quu0 + _matmul(jnp.swapaxes(ju, 0, 1), vju)  # (U,U)
    rhs = jnp.concatenate(
        [jnp.expand_dims(vju[0], 1), jnp.swapaxes(vju, 0, 1)], axis=1
    )  # (U, 13)
    sol = _chol_solve(quu, rhs, U)
    k = sol[:, 0]
    big_k = sol[:, 1:]
    qu_k = _matvec(quu, k)
    s = qxx - _matmul(
        jnp.swapaxes(big_k, 0, 1), _matmul(quu, big_k)
    )
    vxx_new = 0.5 * (s + jnp.swapaxes(s, 0, 1))
    return vxx_new, jnp.sum(qu_k, axis=0, keepdims=True)


def make_kernel(bshape):
    def kernel(vxx_ref, jx_ref, ju_ref, quu0_ref, out_ref):
        vxx = vxx_ref[:]
        jx = jx_ref[:]
        ju = ju_ref[:]
        quu0 = quu0_ref[:]
        acc = jnp.zeros((1,) + bshape, DTYPE)

        def body(i, carry):
            vxx_c, acc = carry
            vxx_n, probe = stage_mix(vxx_c, jx, ju, quu0)
            # keep magnitudes bounded so the loop is stable: blend toward
            # the start matrix with a constant (NO cross-lane reduction —
            # a per-iter max() would dominate both layouts equally and
            # mask the layout difference this probe exists to measure)
            vxx_n = 0.2 * vxx_n + 0.5 * vxx
            return vxx_n, acc + probe

        vxx_f, acc = jax.lax.fori_loop(0, ITERS, body, (vxx, acc))
        out_ref[:] = acc + jnp.sum(vxx_f, axis=0)

    return kernel


def run_layout(name, bshape):
    n_scen = int(np.prod(bshape))
    rng = np.random.default_rng(0)
    a = rng.standard_normal((12, 12) + bshape).astype(np.float32)
    vxx = jnp.asarray(0.1 * (a + np.swapaxes(a, 0, 1)))
    jx = jnp.asarray(
        np.broadcast_to(
            (np.eye(12) + 0.01 * rng.standard_normal((12, 12)))[
                (...,) + (None,) * len(bshape)
            ],
            (12, 12) + bshape,
        ).astype(np.float32)
    )
    ju = jnp.asarray(
        0.05 * rng.standard_normal((12, U) + bshape).astype(np.float32)
    )
    quu0 = jnp.asarray(
        np.broadcast_to(
            (2.0 * np.eye(U))[(...,) + (None,) * len(bshape)],
            (U, U) + bshape,
        ).astype(np.float32)
    )

    fn = pl.pallas_call(
        make_kernel(bshape),
        out_shape=jax.ShapeDtypeStruct((12,) + bshape, DTYPE),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    jfn = jax.jit(lambda *o: jnp.sum(fn(*o)))
    t0 = time.perf_counter()
    out = np.asarray(jfn(vxx, jx, ju, quu0))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = np.asarray(jfn(vxx, jx, ju, quu0))
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts))
    return {
        "layout": name,
        "scenarios": n_scen,
        "p50_ms": round(p50 * 1e3, 2),
        "ns_per_stage_scenario": round(p50 / (ITERS * n_scen) * 1e9, 2),
        "compile_s": round(compile_s, 1),
        "finite": bool(np.isfinite(out)),
    }


def main():
    rows = [
        run_layout("lane (12,12,128) x8 tiles", (1024,)),
        run_layout("supertile (12,12,8,128)", (8, 128)),
    ]
    # 1024-lane single call in the flat layout = 8 tiles of 128 handled by
    # one minor dim of 1024 (Mosaic splits lanes itself)
    speedup = rows[0]["ns_per_stage_scenario"] / rows[1][
        "ns_per_stage_scenario"
    ]
    print(
        json.dumps(
            {
                "metric": "Riccati stage-mix per-scenario cost by layout",
                "rows": rows,
                "supertile_speedup": round(speedup, 3),
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
